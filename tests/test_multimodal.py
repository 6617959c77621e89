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


def test_resize_fits_box_and_preserves_aspect(spark, sf_dir):
    """resize_images must never upscale, must fit the target box, and
    must keep the aspect ratio within integer-arithmetic tolerance."""
    from mapreducepy_spark.io import load
    from mapreducepy_spark.llm import multimodal as mm

    docs = load(spark, sf_dir, "documents").limit(50)
    decoded = mm.decode_images(mm.attach_payload(docs))
    out = mm.resize_images(decoded, max_w=100, max_h=80).toPandas()
    src = decoded.toPandas().set_index("doc_id")
    assert len(out) == len(src)
    for row in out.itertuples():
        w0, h0 = int(src.loc[row.doc_id, "width"]), int(src.loc[row.doc_id, "height"])
        assert 0 < row.width <= min(100, w0)
        assert 0 < row.height <= min(80, h0)
        # aspect preserved: floor(x * num/den) off by < 1 pixel-ratio
        assert abs(row.width * h0 - row.height * w0) <= max(w0, h0)
        # features scaled by exactly num/den
        f0 = list(src.loc[row.doc_id, "feature"])
        assert list(row.feature) == [x * row.scale_num / row.scale_den for x in f0]


def test_payload_stats_md5_certifies_byte_transport(spark, sf_dir):
    """payload_stats must hash the ACTUAL bytes inside the Python
    worker — cross-check one row against hashlib on the driver, and
    the dims against the fake decoder."""
    import hashlib

    docs = load(spark, sf_dir, "documents")
    stats = (
        mm.payload_stats(mm.attach_payload(docs))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(stats) == docs.count()
    row = docs.orderBy("doc_id").limit(1).collect()[0]
    payload = row.text.encode("utf-8")
    got = stats.iloc[0]
    assert got["payload_bytes"] == len(payload)
    assert got["payload_md5"] == hashlib.md5(payload).hexdigest()
    w, h, _ = mm.DeterministicFakeDecoder.decode(payload)
    assert (got["width"], got["height"]) == (w, h)


def test_payload_stats_null_payload_propagates_null(spark):
    """NULL payload ⇒ every stat NULL (octet_length/md5 SQL
    semantics), NOT the zero-filled shape decode_images uses."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "modality": ["image", "image"],
            "payload": [None, b""],
            "media_meta": [None, None],
        }
    )
    payloads = spark.createDataFrame(pdf, schema=mm.PAYLOAD_SCHEMA)
    out = (
        mm.payload_stats(payloads).toPandas().sort_values("doc_id").set_index("doc_id")
    )
    assert out.loc[1, ["payload_bytes", "width", "height", "payload_md5"]].isna().all()
    # empty-but-present payload is a REAL payload: 0 bytes, md5 of b""
    assert out.loc[2, "payload_bytes"] == 0
    assert out.loc[2, "width"] == 1 and out.loc[2, "height"] == 1
    import hashlib

    assert out.loc[2, "payload_md5"] == hashlib.md5(b"").hexdigest()


def test_payload_stats_arbitrary_binary_not_just_utf8(spark):
    """The payload column is OPAQUE bytes — null bytes, invalid
    UTF-8, high bits — and must survive the Arrow round-trip
    bit-exactly (md5-pinned). attach_payload only ever produces
    valid UTF-8, so this is the one test exercising the kernel on
    bytes a real image/audio codec would emit."""
    import hashlib

    import pandas as pd

    payloads = [
        b"\x00\x01\x02\xff\xfe\xfd",          # null + high bytes
        b"\xc3\x28",                            # invalid UTF-8 sequence
        bytes(range(256)),                      # every byte value
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 64,  # PNG-magic-shaped
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "modality": ["image"] * len(payloads),
            "payload": payloads,
            "media_meta": [None] * len(payloads),
        }
    )
    df = spark.createDataFrame(pdf, schema=mm.PAYLOAD_SCHEMA)
    out = mm.payload_stats(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    for i, b in enumerate(payloads):
        assert out.loc[i, "payload_bytes"] == len(b)
        assert out.loc[i, "payload_md5"] == hashlib.md5(b).hexdigest()
        w, h, _ = mm.DeterministicFakeDecoder.decode(b)
        assert (out.loc[i, "width"], out.loc[i, "height"]) == (w, h)
