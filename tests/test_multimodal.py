"""Multimodal plumbing: the import-gated image codec seam.

The Spark-side contract (schema, Arrow batching, one row per asset) must be
identical whether the codec library exists or not — the stub branch runs in
this sandbox (no Pillow); the real-decode branch is skip-gated and runs
anywhere Pillow is installed, decoding genuine PNG payloads end-to-end
through ``mapInPandas``.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.operators import multimodal


def _pil():
    return multimodal._pil_image_module()


def test_image_feature_kernel_contract_without_codec(spark, sf_dir):
    """Whatever the codec availability, every asset comes back exactly once
    with its true byte length; without Pillow the rows are decoded=false
    with null dims (the documented stub branch)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    assets = multimodal.synthesize_assets(docs)
    out = multimodal.extract_image_features(assets).collect()
    assert len(out) == 50
    by_id = {r.asset_id: r for r in out}
    for r in assets.select("asset_id", "n_bytes").collect():
        assert by_id[r.asset_id].n_bytes == r.n_bytes
    if _pil() is None:
        assert all(
            (not r.decoded) and r.width is None and r.mode is None
            for r in out
        )
    else:
        # synthesized payloads are magic+utf8, not real images: the real
        # codec must REJECT them gracefully, not crash the kernel
        assert all(not r.decoded for r in out)


def test_image_feature_kernel_decodes_real_png(spark):
    """With Pillow present, genuine PNG payloads decode through the same
    mapInPandas kernel: true dims + mode, magic-valid, one row per asset.
    Without Pillow, the same payloads flow through the kernel undecoded
    (decoded=False) — always-run so the suite pass count is identical in
    environments with and without the codec (r13 env-pin)."""
    import io

    Image = _pil()
    if Image is None:
        # PNG magic is known without the codec; synthesize magic+payload
        rows = [
            (i, bytearray(b"\x89PNG\r\n\x1a\n" + bytes(16)), w, h)
            for i, (w, h) in enumerate([(4, 3), (16, 16), (2, 7)])
        ]
    else:
        rows = []
        for asset_id, (w, h) in enumerate([(4, 3), (16, 16), (2, 7)]):
            buf = io.BytesIO()
            Image.new("RGB", (w, h), color=(asset_id, 0, 0)).save(buf, "PNG")
            rows.append((asset_id, bytearray(buf.getvalue()), w, h))
    assets = spark.createDataFrame(
        [(i, p) for i, p, _, _ in rows], "asset_id long, payload binary"
    )
    got = {
        r.asset_id: r
        for r in multimodal.extract_image_features(assets).collect()
    }
    if Image is None:
        assert all(not got[i].decoded for i, _, _, _ in rows)
        assert all(
            got[i].width is None and got[i].n_bytes == 24
            for i, _, _, _ in rows
        )
    else:
        for i, _, w, h in rows:
            assert got[i].decoded and (got[i].width, got[i].height) == (w, h)
            assert got[i].mode == "RGB"


def test_decode_image_stub_raises_cleanly():
    """Always-run both-branch contract (r13 env-pin): with no codec the
    stub raises NotImplementedError; with a codec present a garbage payload
    raises a decode error, never a silent success."""
    if _pil() is not None:
        with pytest.raises(Exception):
            multimodal.decode_image(b"\x89IMGpayload")
    else:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89IMGpayload")


# --- audio seam (r6): soundfile import-gated + stdlib-wave PCM fallback ----


def _wav_bytes(sample_rate=8000, n_channels=1, n_samples=1600, seed=7):
    """Synthesize a deterministic PCM16 WAV entirely from the stdlib."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * n_channels,
                *[((seed * 2654435761 * (i + 1 + c)) % 20000) - 10000
                  for c in range(n_channels)],
            )
            for i in range(n_samples)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_audio_feature_kernel_decodes_wav_everywhere(spark):
    """The stdlib-wave fallback means real decode runs even with no codec
    lib installed: true sample_rate/channels/frames/duration come back
    through the same Arrow-batched kernel a soundfile deployment uses."""
    cases = [
        (0, 8000, 1, 1600),
        (1, 16000, 2, 800),
        (2, 44100, 1, 441),
    ]
    assets = spark.createDataFrame(
        [
            (i, bytearray(_wav_bytes(sr, ch, ns)))
            for i, sr, ch, ns in cases
        ],
        "asset_id long, payload binary",
    )
    got = {
        r.asset_id: r
        for r in multimodal.extract_audio_features(assets).collect()
    }
    assert len(got) == len(cases)
    for i, sr, ch, ns in cases:
        r = got[i]
        assert r.decoded
        assert r.codec in ("wave", "soundfile")
        assert (r.sample_rate, r.n_channels, r.n_samples) == (sr, ch, ns)
        assert abs(r.duration_s - ns / sr) < 1e-9


def test_audio_feature_kernel_contract_on_undecodable_payloads(spark, sf_dir):
    """Synthesized magic+utf8 payloads are NOT audio: every asset still comes
    back exactly once, decoded=false, null fields, true byte length — the
    same honest-degradation contract as the image path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    assets = multimodal.synthesize_assets(docs)
    out = multimodal.extract_audio_features(assets).collect()
    assert len(out) == 30
    by_id = {r.asset_id: r for r in out}
    for r in assets.select("asset_id", "n_bytes").collect():
        assert by_id[r.asset_id].n_bytes == r.n_bytes
    assert all(
        (not r.decoded)
        and r.codec is None
        and r.sample_rate is None
        and r.duration_s is None
        for r in out
    )


def test_decode_audio_mixed_payload_batch(spark):
    """A batch mixing decodable WAVs and garbage must decode row-by-row, not
    fail the whole Arrow batch."""
    rows = [
        (0, bytearray(_wav_bytes())),
        (1, bytearray(b"AUD0 not really audio")),
        (2, bytearray(_wav_bytes(16000, 1, 320))),
    ]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {
        r.asset_id: r
        for r in multimodal.extract_audio_features(assets).collect()
    }
    assert got[0].decoded and got[2].decoded and not got[1].decoded
    assert got[2].sample_rate == 16000


def test_audio_feature_kernel_codec_branch(spark):
    """Always-run both-branch contract (r13 env-pin): with soundfile
    installed the WAV decodes via the soundfile branch (it takes priority
    over the stdlib fallback); without it, the same WAV decodes via the
    stdlib ``wave`` fallback. Suite pass count is identical either way."""
    assets = spark.createDataFrame(
        [(0, bytearray(_wav_bytes()))], "asset_id long, payload binary"
    )
    [r] = multimodal.extract_audio_features(assets).collect()
    if multimodal._soundfile_module() is not None:
        assert r.decoded and r.codec == "soundfile"
    else:
        assert r.decoded and r.codec == "wave"
