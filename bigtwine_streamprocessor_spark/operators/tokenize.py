"""Pluggable tokenizer seam for token-budget operators.

Real training pipelines pack and budget by BPE tokens, not whitespace
splits. This module is the seam between the two: every token-budget
operator (``curation.pack_sequences``, ``corpus_prep.
curriculum_token_budget``) takes a ``tokenizer`` name and routes its
``n_tokens`` column through :func:`with_n_tokens`.

* ``"whitespace"`` (default) stays a pure JVM Column expression —
  whole-stage-codegen, zero Python in the hot path, and the DuckDB-oracle
  twin (``len(string_split(text, ' '))``) keeps gating it per round.
* ``"regex"`` is the BPE-ish regex (same pattern as
  ``textstats.token_counts``) — also a pure Column expression.
* ``"tiktoken"`` / ``"hf:<tokenizer.json>"`` are REAL subword kernels
  behind import gates (the libs are not in this sandbox), running as an
  Arrow-batched ``mapInPandas`` with per-worker encoder init and batch
  encode calls — the same seam pattern as ``multimodal``'s codec contract:
  the Spark-side plumbing (schema, batching, column flow) is identical and
  tested whether or not the import succeeds; only the kernel swaps.

Custom kernels register at runtime with :func:`register_tokenizer` — any
callable returning a per-worker ``list[str] -> list[int]`` batch counter.

Scale posture: the subword path is the canonical Arrow batch shape —
one encoder per worker (amortized init), whole Arrow record batches per
encode call, no per-row Python. Counting is map-only; the downstream
packing/budget operators keep their single-shuffle shapes regardless of
tokenizer choice.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import TOKEN_PATTERN

# name -> factory building a per-worker batch counter: list[str] -> list[int]
_KERNELS: dict[str, Callable[[], Callable[[list[str]], list[int]]]] = {}

# pure-Column tokenizers: name -> (text Column -> count Column)
_COLUMN_TOKENIZERS: dict[str, Callable[[Column], Column]] = {
    "whitespace": lambda text: F.size(F.split(text, " ")),
    "regex": lambda text: F.size(
        F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)
    ),
}


def register_tokenizer(
    name: str, factory: Callable[[], Callable[[list[str]], list[int]]]
) -> None:
    """Register a subword kernel. ``factory`` runs ONCE per worker and
    returns the batch counter; heavy encoder construction belongs in the
    factory, not the counter."""
    _KERNELS[name] = factory


def _tiktoken_factory() -> Callable[[list[str]], list[int]]:
    import tiktoken  # import-gated: not in this sandbox

    enc = tiktoken.get_encoding("cl100k_base")
    return lambda texts: [len(t) for t in enc.encode_ordinary_batch(texts)]


def _hf_factory(path: str) -> Callable[[], Callable[[list[str]], list[int]]]:
    def factory() -> Callable[[list[str]], list[int]]:
        from tokenizers import Tokenizer  # import-gated: not in this sandbox

        tok = Tokenizer.from_file(path)
        return lambda texts: [
            len(e.ids) for e in tok.encode_batch(texts, add_special_tokens=False)
        ]

    return factory


def _resolve_kernel(name: str) -> Callable[[], Callable[[list[str]], list[int]]]:
    if name in _KERNELS:
        return _KERNELS[name]
    if name == "tiktoken":
        return _tiktoken_factory
    if name.startswith("hf:"):
        return _hf_factory(name[3:])
    raise ValueError(
        f"unknown tokenizer {name!r}; built-ins: "
        f"{sorted(_COLUMN_TOKENIZERS)}, kernels: {sorted(_KERNELS)}, "
        "'tiktoken', 'hf:<tokenizer.json>'"
    )


def available(name: str) -> bool:
    """Whether ``name`` can actually run here (imports resolve)."""
    if name in _COLUMN_TOKENIZERS or name in _KERNELS:
        return True
    try:
        _resolve_kernel(name)()
        return True
    except Exception:
        return False


def with_n_tokens(
    docs: DataFrame, tokenizer: str = "whitespace", text_col: str = "text"
) -> DataFrame:
    """Append ``n_tokens`` (bigint) to ``docs``.

    Column tokenizers stay in codegen; kernel tokenizers run one Arrow
    batch at a time through ``mapInPandas`` with the full input schema
    preserved, so downstream operators are tokenizer-agnostic.
    """
    if tokenizer in _COLUMN_TOKENIZERS:
        return docs.withColumn(
            "n_tokens",
            _COLUMN_TOKENIZERS[tokenizer](F.col(text_col)).cast("bigint"),
        )

    factory = _resolve_kernel(tokenizer)
    # build a FRESH StructType: StructType.add mutates in place, and
    # docs.schema hands back the DataFrame's cached schema object
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(docs.schema.fields) + [StructField("n_tokens", LongType())]
    )

    def count_batches(batches: Iterator) -> Iterator:
        counter = factory()  # once per worker task, not per batch
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            out = pdf.copy()
            out["n_tokens"] = counter(texts)
            yield out

    return docs.mapInPandas(count_batches, schema=out_schema)
