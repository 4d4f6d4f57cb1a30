"""Library-level operator tests (beyond the oracle gate): the generic
asof_join and the multimodal decode stubs/plumbing."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engine.operators.asof import asof_join
from engine.operators.multimodal import decode_audio, decode_image, extract_blob_meta
from tests.conftest import SF_SMOKE


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_strict_prior(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 100.0),
            ("A", _ts("2024-01-01T10:00:05"), 101.0),
            ("A", _ts("2024-01-01T10:00:10"), 102.0),
            ("B", _ts("2024-01-01T10:00:03"), 50.0),
        ],
        ["sym", "qts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:07"), 10),   # latest prior quote: 101.0
            ("A", _ts("2024-01-01T10:00:05"), 20),   # tie ts, strict ⇒ 100.0
            ("B", _ts("2024-01-01T10:00:01"), 30),   # no prior quote ⇒ NULL
        ],
        ["sym", "tts", "qty"],
    )
    out = {
        (r["sym"], r["qty"]): r["asof_px"]
        for r in asof_join(trades, quotes, "sym", "tts", "qts", ["px"]).collect()
    }
    assert out[("A", 10)] == 101.0
    assert out[("A", 20)] == 100.0
    assert out[("B", 30)] is None


def test_asof_join_inclusive(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:05"), 101.0)], ["sym", "qts", "px"]
    )
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:05"), 1)], ["sym", "tts", "qty"]
    )
    row = asof_join(trades, quotes, "sym", "tts", "qts", ["px"], strict=False).first()
    assert row["asof_px"] == 101.0


def test_asof_join_null_ts_and_duplicate_ts_determinism(spark):
    """Right rows with NULL timestamps must never match (they'd sort
    NULLS FIRST into every frame), and duplicate-timestamp right rows
    must resolve by the deterministic value tiebreak, not task order."""
    quotes = spark.createDataFrame(
        [
            ("A", None, 99.0),  # no timestamp: can never be "prior"
            ("A", _ts("2024-01-01T10:00:01"), 100.0),
            ("A", _ts("2024-01-01T10:00:01"), 105.0),  # duplicate ts
        ],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:05"), 1),  # after both real quotes
            ("A", _ts("2024-01-01T10:00:00"), 2),  # before every real quote
        ],
        "sym string, tts timestamp, qty int",
    )
    out = {
        r["qty"]: r["asof_px"]
        for r in asof_join(trades, quotes, "sym", "tts", "qts", ["px"]).collect()
    }
    assert out[1] == 105.0  # max-value tiebreak among equal timestamps
    assert out[2] is None  # NOT 99.0 from the NULL-ts row


def test_range_join_subsecond_interval_end(spark):
    """An interval whose end carries sub-second precision must still
    match points in its final grid cell (unix_timestamp truncation
    used to drop that cell), and end <= start intervals yield nothing
    instead of a descending cell explosion."""
    import datetime as dt

    from engine.operators.rangejoin import range_join

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    points = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=100, milliseconds=200))], "pid int, t timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (10, base + dt.timedelta(seconds=95), base + dt.timedelta(seconds=100, milliseconds=500)),
            (11, base + dt.timedelta(seconds=300), base + dt.timedelta(seconds=200)),  # corrupt: end < start
        ],
        "iid int, s timestamp, e timestamp",
    )
    got = {(r.pid, r.iid) for r in range_join(points, intervals, "t", "s", "e", 10).collect()}
    assert got == {(1, 10)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join(points, intervals, "t", "s", "e", 10, how="left")


def test_multimodal_decode_gated_on_codecs():
    """decode_image decodes PNG in EVERY environment (PIL when
    installed, else the pure-stdlib parser) and rejects non-PNG
    formats without PIL; decode_audio always decodes WAV — via
    soundfile when installed, else the pure-stdlib RIFF parse — and
    rejects garbage bytes."""
    from engine.operators.multimodal import (
        HAS_PIL,
        HAS_SOUNDFILE,
        synth_png,
        synth_wav,
    )

    # Image decodes in EVERY environment (VERDICT r4 #7).
    assert decode_image(synth_png(3, 2, 3, 17)) == (3, 2, 3)
    if HAS_PIL:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (3, 2)).save(buf, "PNG")
        assert decode_image(buf.getvalue()) == (3, 2, 3)
    else:
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0 not-a-png")  # JPEG magic
    # Audio decodes in EVERY environment (VERDICT r3 #6).
    assert decode_audio(synth_wav(16000, 16000)) == (16000, 16000)
    if not HAS_SOUNDFILE:
        with pytest.raises(ValueError):
            decode_audio(b"RIFF")


def _png_filter_stream(raw_rows, filter_types, bpp):
    """Reference FILTER-direction implementation (PNG spec §6): the
    test owns the encode so parse_png's de-filter is checked against
    an independent derivation, not against synth_png."""
    stream = bytearray()
    prior = bytes(len(raw_rows[0]))
    for row, ft in zip(raw_rows, filter_types):
        stream.append(ft)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            stream.append((x - pred) & 0xFF)
        prior = bytes(row)
    return bytes(stream)


def test_parse_png_inverts_all_five_filters():
    """parse_png must reconstruct arbitrary pixel data through every
    PNG filter type (None/Sub/Up/Average/Paeth), verified against an
    independent encode of pseudo-random rows."""
    import random
    import struct
    import zlib

    from engine.operators.multimodal import PNG_SIG, _png_chunk, parse_png

    rng = random.Random(42)
    width, height, channels = 7, 5, 3
    rows = [
        bytes(rng.randrange(256) for _ in range(width * channels))
        for _ in range(height)
    ]
    stream = _png_filter_stream(rows, [0, 1, 2, 3, 4], channels)
    payload = (
        PNG_SIG
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        )
        + _png_chunk(b"IDAT", zlib.compress(stream))
        + _png_chunk(b"IEND", b"")
    )
    w, h, c, n_raw, pix_sum = parse_png(payload)
    assert (w, h, c) == (width, height, channels)
    assert n_raw == height * (1 + width * channels)
    assert pix_sum == sum(sum(r) for r in rows)


def test_parse_png_rejects_corruption():
    """A flipped payload byte must surface as a CRC error, not silent
    garbage — the structural parse is load-bearing, not decorative."""
    from engine.operators.multimodal import synth_png, parse_png

    payload = bytearray(synth_png(8, 8, 1, 99))
    assert parse_png(bytes(payload))[0] == 8
    payload[40] ^= 0xFF  # inside IDAT body
    with pytest.raises(ValueError):
        parse_png(bytes(payload))


def test_decode_image_golden_png_fixture():
    """Checked-in PNG fixture: the stdlib parse must read the exact
    header/pixel facts (16x9 RGB, constant 200, filters cycling all
    five spec types), and the synthesizer must reproduce the fixture
    bit-identically — pinning both directions of the PNG round trip
    against drift (the image twin of the tone_8k.wav golden)."""
    import os

    from engine.operators.multimodal import parse_png, synth_png

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "const_16x9.png")
    payload = open(fix, "rb").read()
    assert parse_png(payload) == (16, 9, 3, 9 * (1 + 16 * 3), 16 * 9 * 3 * 200)
    assert decode_image(payload) == (16, 9, 3)
    assert synth_png(16, 9, 3, 200) == payload


def test_parse_png_max_dimension_guard():
    """The pure-Python de-filter loop must refuse full-size images
    (per-byte Python; meant for ≤64×64 probes) — and must refuse them
    from the HEADER, before inflating anything."""
    import struct

    import pytest

    from engine.operators.multimodal import PNG_SIG, _png_chunk, parse_png

    payload = (
        PNG_SIG
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 4096, 4096, 8, 2, 0, 0, 0)
        )
        + _png_chunk(b"IDAT", b"")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="too large"):
        parse_png(payload)


def test_decode_audio_golden_wav_fixture():
    """Checked-in 1 kB WAV fixture: the stdlib parse must read the
    exact header fields byte-for-byte (8 kHz, 1000 8-bit mono frames,
    1044 total bytes), and the synthesizer must reproduce the fixture
    bit-identically — pinning both directions of the RIFF round trip
    against silent drift."""
    import os

    from engine.operators.multimodal import synth_wav

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "tone_8k.wav")
    payload = open(fix, "rb").read()
    assert len(payload) == 1044
    assert decode_audio(payload) == (1000, 8000)
    assert synth_wav(8000, 1000) == payload


def test_extract_blob_meta_plumbing(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world!")], ["doc_id", "txt"])
    blobs = df.select("doc_id", F.encode("txt", "UTF-8").alias("payload"))
    rows = {r["doc_id"]: r for r in extract_blob_meta(blobs, "doc_id", "payload").collect()}
    assert rows[1]["n_bytes"] == 5
    assert rows[2]["n_bytes"] == 6
    import hashlib

    assert rows[1]["checksum"] == hashlib.md5(b"hello").hexdigest()
    assert 1 <= rows[1]["fake_width"] <= 1920
    assert 1 <= rows[1]["fake_height"] <= 1080
    assert 1 <= rows[1]["fake_channels"] <= 3


def test_ivf_recall_vs_brute_force(spark):
    """IVF top-k must recover most of the exact top-k (nprobe=4 of 16
    cells). Recall is the operator's quality contract; correctness of
    the IVF result itself is oracle-checked."""
    from engine.operators.similarity import ann_cosine_topk, ann_ivf_topk

    sf = SF_SMOKE
    exact = {
        (r.query_id, r.neighbor_id) for r in ann_cosine_topk(spark, sf).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in ann_ivf_topk(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_hamming_recall_vs_brute_force(spark):
    """Sign-bit Hamming candidates + exact rerank must recover most of
    the exact top-k (corpus-proportional candidate pool from 64-bit
    signatures). Recall is the operator's quality contract; the result
    itself is oracle-checked (ann_hamming_topk / ann_topk facet)."""
    from engine.operators.similarity import ann_cosine_topk, ann_hamming_topk

    sf = SF_SMOKE
    exact = {
        (r.query_id, r.neighbor_id) for r in ann_cosine_topk(spark, sf).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_hamming_topk(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"Hamming recall {recall:.2f} below floor"


def test_range_join_generic_semantics(spark):
    """Half-open containment, multi-bucket intervals, extra conditions."""
    from engine.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00")),
         (2, _ts("2024-01-01 11:59:59")),
         (3, _ts("2024-01-02 12:00:00")),   # == interval end: excluded
         (4, _ts("2024-01-03 00:00:00"))],
        "pid int, t timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 12:00:00")),
         (11, _ts("2024-01-02 12:00:00"), _ts("2024-01-04 00:00:00"))],
        "iid int, s timestamp, e timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(points, intervals, "t", "s", "e", 3600).collect()
    }
    # pid=1 starts exactly at interval 10's start (inclusive); pid=3 is
    # exactly interval 10's end (exclusive) and interval 11's start.
    assert got == {(1, 10), (2, 10), (3, 11), (4, 11)}

    narrowed = range_join(
        points, intervals, "t", "s", "e", 3600,
        extra_condition=F.col("pid") != 3,
    )
    assert {(r.pid, r.iid) for r in narrowed.collect()} == {(1, 10), (2, 10), (4, 11)}


def test_lsh_dedup_recall_floors(spark):
    """Quality contracts for the approximate dedup paths, measured
    against their exact twins (values at sf0.001; floors leave margin):
    sign-LSH ~0.52 of cos>=0.4 pairs with 16 bits / 4 bands — raise
    bits for higher recall; MinHash banding recovers ~all exact-Jaccard
    pairs; SimHash blocking finds most of them under a different
    (hamming) metric."""
    from engine.registry import all_queries_including_library

    q = all_queries_including_library()
    sf = SF_SMOKE
    from engine.operators.similarity import embedding_near_dups_brute

    brute = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dups_brute(spark, sf).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b) for r in q["sign_lsh_near_dups"].fn(spark, sf).collect()
    }
    assert len(brute & lsh) / len(brute) >= 0.4

    exact = {
        (r.doc_a, r.doc_b) for r in q["dedup_ngram_jaccard"].fn(spark, sf).collect()
    }
    mh = {(r.doc_a, r.doc_b) for r in q["dedup_minhash_lsh"].fn(spark, sf).collect()}
    assert len(exact & mh) / len(exact) >= 0.9

    from engine.operators.dedup import simhash_near_pairs

    sh = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(spark, sf).collect()}
    assert len(exact & sh) / len(exact) >= 0.7


def test_crossdoc_coverage_exact_dups_are_fully_covered(spark, tmp_path):
    """Invariant: a document with a verbatim copy elsewhere shares every
    gram cross-doc, so its duplicated-span coverage is exactly 1.0 and
    dup_heavy; a document sharing nothing has coverage 0."""
    from engine.operators.dedup import dedup_crossdoc_ngram_coverage

    twin = "a b c d e f g h i j k l"
    rows = [
        (0, twin, "en", "web", len(twin)),
        (1, twin, "en", "web", len(twin)),
        (2, "one two three four five six seven eight", "en", "web", 39),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    cov = {
        r["doc_id"]: r
        for r in dedup_crossdoc_ngram_coverage(spark, str(tmp_path)).collect()
    }
    assert cov[0]["coverage_frac"] == 1.0 and cov[0]["dup_heavy"] == 1
    assert cov[1]["coverage_frac"] == 1.0 and cov[1]["dup_heavy"] == 1
    assert cov[2]["coverage_frac"] == 0.0 and cov[2]["dup_heavy"] == 0
    assert cov[2]["dup_gram_occurrences"] == 0


def test_length_bucket_ladder_covers_fixture(spark):
    """The seq-len bucket ladder must cover the fixture corpus — a doc
    landing in the overflow bucket means the ladder drifted out from
    under the data (the oracle would still match, silently)."""
    from engine.operators.pipeline import LEN_OVERFLOW, pipeline_length_buckets

    rows = pipeline_length_buckets(spark, SF_SMOKE).collect()
    buckets = {r["bucket"] for r in rows}
    assert str(LEN_OVERFLOW) not in buckets, sorted(buckets)
    assert "global" in buckets


def test_length_buckets_all_empty_corpus_is_defined(spark, tmp_path):
    """An all-whitespace corpus has max_tok = 0; the global row's
    waste_bp denominator is guarded (greatest/coalesce) so the result
    is a defined 0, not a divide-by-zero (ANSI error in Spark, hard
    error in the DuckDB oracle)."""
    import duckdb

    from engine.operators.pipeline import pipeline_length_buckets
    from engine.registry import all_queries_including_library

    rows = [(i, "   ", "en", "synth", 3) for i in range(4)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["bucket"]: r for r in pipeline_length_buckets(spark, str(tmp_path)).collect()
    }
    assert got["global"]["waste_bp"] == 0
    assert got["global"]["padded"] == 0
    # The oracle survives the same corpus (same guard in SQL).
    sql = all_queries_including_library()["pipeline_length_buckets"].oracle
    con = duckdb.connect()
    glob = str(tmp_path / "documents.parquet" / "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')"
    )
    orc = {r[0]: r for r in con.execute(sql).fetchall()}
    assert orc["global"][4] == 0


def test_resize_nearest_identity_and_mapping():
    """resize_nearest must be the identity at equal dims, replicate a
    1x1 source everywhere, and follow the floor-grid mapping on a
    known asymmetric case (downscale 4x2 -> 2x2 RGB picks rows 0,1 and
    cols 0,2)."""
    from engine.operators.multimodal import (
        parse_png_pixels,
        resize_nearest,
        synth_png_gradient,
    )

    payload = synth_png_gradient(4, 2, 3, 10)
    w, h, c, _, rows = parse_png_pixels(payload)
    assert (w, h, c) == (4, 2, 3)
    # identity
    same = resize_nearest(rows, w, c, 4, 2)
    assert [bytes(r) for r in same] == [bytes(r) for r in rows]
    # 1x1 replication
    one = resize_nearest([rows[0][:c]], 1, c, 3, 3)
    assert all(bytes(r) == bytes(rows[0][:c]) * 3 for r in one)
    # floor-grid downscale: out (r, c') samples src ((r*2)//2, (c'*4)//2)
    down = resize_nearest(rows, w, c, 2, 2)
    want = [
        bytes(rows[0][0:3] + rows[0][6:9]),
        bytes(rows[1][0:3] + rows[1][6:9]),
    ]
    assert [bytes(r) for r in down] == want
