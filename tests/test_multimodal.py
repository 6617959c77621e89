"""Binary-payload plumbing: schema, Arrow batch path, and the honest
decode stub (SURVEY.md §2.10 — multimodal columns; codecs absent in
this container, so the decode is a deterministic fake / explicit
NotImplementedError)."""

from __future__ import annotations

import pytest

from mapreducepy_spark.io import load
from mapreducepy_spark.llm import multimodal as mm


def test_attach_payload_schema(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    p = mm.attach_payload(docs)
    assert [f.name for f in p.schema.fields] == [
        "doc_id",
        "modality",
        "payload",
        "media_meta",
    ]
    assert p.schema["payload"].dataType.typeName() == "binary"
    row = p.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))


def test_decode_images_fake_codec_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    p = mm.attach_payload(docs)
    feats = mm.decode_images(p).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(feats) == docs.count()
    assert (feats["payload_bytes"] > 0).all()
    assert feats["feature"].map(len).eq(4).all()
    # deterministic: second run bit-identical
    feats2 = mm.decode_images(p).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert feats.equals(feats2)


def test_decode_images_real_codec_is_honest_stub(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    p = mm.attach_payload(docs).limit(2)
    with pytest.raises(Exception) as exc_info:
        mm.decode_images(p, use_real_codec=True).collect()
    assert "DecoderUnavailable" in str(exc_info.value) or "Pillow" in str(
        exc_info.value
    )


def test_sample_frames_offsets(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    p = mm.attach_payload(docs, modality="video").limit(5)
    frames = mm.sample_frames(p, every_n_bytes=32).toPandas()
    assert (frames["offset"] % 32 == 0).all()
    # every payload contributes ceil(len/32) frames
    sizes = {r.doc_id: len(r.payload) for r in p.collect()}
    for doc_id, n in sizes.items():
        got = (frames["doc_id"] == doc_id).sum()
        assert got == -(-n // 32)
