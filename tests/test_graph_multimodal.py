"""Rows-only driver-contract ops: PageRank vs an in-repo numpy oracle,
and multimodal plumbing (schema, determinism, stub behavior)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from lean_explore_spark.operators import graph as G
from lean_explore_spark.operators import multimodal as M
from tests.conftest import SF_ORACLE


def _numpy_pagerank(edges, alpha=0.85, tol=1e-8, max_iter=100):
    """Power iteration matching networkx semantics (reference
    scripts/pagerank.py:76: alpha=0.85, tol=1e-8, L1 convergence)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        new = np.full(n, (1 - alpha) / n)
        dangling = sum(r[idx[v]] for v in nodes if v not in out)
        new += alpha * dangling / n
        for s, ds in out.items():
            share = alpha * r[idx[s]] / len(ds)
            for d in ds:
                new[idx[d]] += share
        if np.abs(new - r).sum() < n * tol:
            r = new
            break
        r = new
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy(spark):
    rows = duckdb.sql(
        f"select distinct l_suppkey, l_partkey from '{SF_ORACLE}/lineitem.parquet'"
    ).fetchall()
    edges = [(int(s), int(p) + 1_000_000) for s, p in rows]
    want = _numpy_pagerank(edges)

    got_rows = G.supplier_part_pagerank(spark, SF_ORACLE).collect()
    got = {int(r["node"]): r["rank"] for r in got_rows}
    assert set(got) == set(want)
    for node, w in want.items():
        # engine output is rounded to 8dp → up to 5e-9 rounding slack
        assert got[node] == pytest.approx(w, rel=1e-5, abs=1e-8), node
    # ranks sum to ~1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_image_features_schema_and_determinism(spark):
    feats = M.image_features(M.generate_media(spark, 90)).collect()
    assert len(feats) == 30  # a third are images
    by_id = {r["media_id"]: list(r["feature"]) for r in feats}
    assert all(len(v) == M.FEATURE_DIM for v in by_id.values())
    again = {
        r["media_id"]: list(r["feature"])
        for r in M.image_features(M.generate_media(spark, 90)).collect()
    }
    assert by_id == again


@pytest.mark.skipif(
    M._REAL_IMAGE_CODEC is not None, reason="a real image codec is installed"
)
def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"not-a-real-png")


@pytest.mark.skipif(
    M._REAL_IMAGE_CODEC is None, reason="no image codec in this environment"
)
def test_decode_real_codec_roundtrip():
    """With Pillow/imageio installed, fake=False decodes real bytes
    (feature-detected path, r3 VERDICT #5)."""
    import io

    from PIL import Image

    want = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    buf = io.BytesIO()
    Image.fromarray(want, "RGB").save(buf, format="PNG")
    got = M.decode_image(buf.getvalue())
    assert got.shape == (4, 3, 3) and np.array_equal(got, want)


def test_frame_sample(spark):
    media = M.generate_media(spark, 30)
    rows = M.frame_sample(media, every=4).collect()
    metas = {
        r["media_id"]: r["n_frames"]
        for r in media.where("kind = 'video'").collect()
    }
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(got) == set(metas)
    for mid, idxs in got.items():
        assert idxs == list(range(0, metas[mid], 4))


def test_resize_images_shape_and_determinism(spark):
    import numpy as np

    from lean_explore_spark.operators.multimodal import (
        decode_image,
        generate_media,
        resize_images,
    )

    media = generate_media(spark, 60)
    rows = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images > 0
    for mid, r in rows.items():
        px = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
        assert px.shape == (4 * 4 * 3,)
        assert r["width"] == r["height"] == 4
    # pure function of the payload: same rows at any parallelism
    again = {
        r["media_id"]: bytes(r["pixels"])
        for r in resize_images(media.repartition(7), 4, 4).collect()
    }
    assert {m: bytes(r["pixels"]) for m, r in rows.items()} == again
    # nearest-neighbor math matches a direct numpy gather on one image
    payload = media.where("media_id = 0").head()["payload"]
    img = decode_image(bytes(payload), fake=True)
    ys = (np.arange(4) * img.shape[0]) // 4
    xs = (np.arange(4) * img.shape[1]) // 4
    assert bytes(rows[0]["pixels"]) == img[ys][:, xs].tobytes()
