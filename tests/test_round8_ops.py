"""Round-8 tests: the four ADVICE r7 hardening fixes, then new operators."""
import os
import time

import pytest
from pyspark.sql import functions as F

import wms_data_pipeline_spark.operators.multimodal as mm


# ------------------------------------------------ LZW deferred-clear cap


def _pack_codes_lsb(codes, min_code_size):
    """Bit-pack LZW codes LSB-first, mirroring the decoder's width
    schedule (widen when ITS table hits 2^width, cap 12) WITHOUT ever
    emitting CLEAR — a foreign 'deferred clear' stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table_len = clear + 2
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(c, w):
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for i, c in enumerate(codes):
        emit(c, width)
        if i > 0 and table_len < 4096:
            table_len += 1
        if table_len == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_deferred_clear_caps_table_at_4096():
    """A stream that never CLEARs must decode with the table frozen at
    4096 entries (12-bit ceiling), not grow unboundedly (ADVICE r7)."""
    n = 9000  # enough repeats of code 0 to blow past 4096 table adds
    data = _pack_codes_lsb([0] * n, 2)
    out = mm._lzw_decompress_gif(data, 2)
    assert out == b"\x00" * n


def test_lzw_selfencoded_roundtrip_still_exact():
    big = bytes((i * 7 + (i >> 3)) % 256 for i in range(20000))
    comp = mm._lzw_compress_gif(big, 8)
    assert mm._lzw_decompress_gif(comp, 8) == big


# ------------------------------------- process index cache fingerprinting


def test_process_cached_index_invalidates_on_data_change(tmp_path):
    from wms_data_pipeline_spark.plans import queries as Q

    sf = tmp_path / "sf"
    sf.mkdir()
    pq = sf / "documents.parquet"
    pq.write_bytes(b"x")
    builds = []
    p1 = Q._process_cached_index("t8", str(sf), lambda p: builds.append(p))
    p2 = Q._process_cached_index("t8", str(sf), lambda p: builds.append(p))
    assert p1 == p2 and len(builds) == 1
    # regenerate the dataset -> newer mtime -> cache must rebuild
    time.sleep(0.02)
    pq.write_bytes(b"y")
    os.utime(pq)
    p3 = Q._process_cached_index("t8", str(sf), lambda p: builds.append(p))
    assert len(builds) == 2 and p3 != p1
    # cleanup hook removes every cached dir
    Q._cleanup_process_idx_cache()
    assert not os.path.exists(p1) and not os.path.exists(p3)
    assert not Q._PROCESS_IDX_CACHE


# --------------------------------------- ingest-stream index precondition


def test_ingest_streams_require_index_up_front(spark, tmp_path):
    from wms_data_pipeline_spark.streaming.pipeline import (
        curation_ingest_stream,
        neardup_ingest_stream,
    )

    stream = spark.readStream.format("rate").load()
    missing = str(tmp_path / "no_such_index")
    with pytest.raises(ValueError, match="neardup_index_write"):
        neardup_ingest_stream(
            stream, missing, str(tmp_path / "p"), str(tmp_path / "c1")
        )
    with pytest.raises(ValueError, match="neardup_index_write"):
        curation_ingest_stream(
            stream, missing, str(tmp_path / "a"), str(tmp_path / "c2")
        )
