"""Input connectors: dataset TSV (rate-limitable), tweet-JSON replay, tick
source, Kafka (gated on broker availability)."""
