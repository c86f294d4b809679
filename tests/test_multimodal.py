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


@pytest.mark.skipif(_pil() is None, reason="Pillow not installed")
def test_image_feature_kernel_decodes_real_png(spark):
    """With Pillow present, genuine PNG payloads decode through the same
    mapInPandas kernel: true dims + mode, magic-valid, one row per asset."""
    import io

    Image = _pil()
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
    for i, _, w, h in rows:
        assert got[i].decoded and (got[i].width, got[i].height) == (w, h)
        assert got[i].mode == "RGB"


def test_decode_image_stub_raises_cleanly():
    if _pil() is not None:
        pytest.skip("codec present; stub branch unreachable")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89IMGpayload")
