"""Round-18 operator hardening tests.

GIF loud-failure policy (the round-17 ADVICE finding): a truncated
payload anywhere in the block walk raises the file's NAMED
ValueError — never a bare IndexError or struct.error — and a
truncated LZW code stream raises instead of silently returning
partial pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    multimodal as mm,
)


def test_truncated_lzw_stream_raises_not_partial_output():
    raw = bytes(range(256)) * 4
    lzw = mm._lzw_encode_gif(raw)
    # cut mid-stream: data ends before EOI → named error, no partial
    with pytest.raises(ValueError, match="truncated GIF LZW"):
        mm._lzw_decode_gif(lzw[: len(lzw) // 2])
    # the intact stream still round-trips
    assert mm._lzw_decode_gif(lzw) == raw


def test_every_gif_prefix_fails_loudly_or_decodes_completely():
    """Exhaustive truncation sweep: for EVERY strict prefix of a valid
    GIF, decode_gif either raises the named ValueError family or (once
    the complete image block is present — the trailer is not required
    to decode) returns the full payload. No prefix may escape as a
    bare IndexError / struct.error / numpy buffer error."""
    raw = b"sweep payload \x00\xff" * 3
    g = mm.encode_gif(raw)
    w_full, h_full, img_full = mm.decode_gif(g)
    complete = 0
    for i in range(len(g)):
        try:
            w, h, img = mm.decode_gif(g[:i])
        except ValueError:
            continue
        # success is only legal when the whole image block was present,
        # and then it must be byte-identical to the full decode
        assert (w, h) == (w_full, h_full)
        assert np.array_equal(img, img_full)
        complete += 1
    # the only decodable strict prefix is "everything but the trailer"
    assert complete == 1


@pytest.mark.parametrize(
    "cut,what",
    [
        (10, "logical screen descriptor"),  # inside the LSD
        (200, "global color table"),  # inside the 768-byte GCT
    ],
)
def test_named_truncation_errors_name_the_block(cut, what):
    g = mm.encode_gif(b"abc")
    with pytest.raises(ValueError, match=f"truncated GIF.*{what}"):
        mm.decode_gif(g[:cut])


def test_truncated_extension_walk_raises_named_error():
    g = bytearray(mm.encode_gif(b"payload"))
    desc = 6 + 7 + 768  # image descriptor offset (hdr + LSD + GCT)
    assert g[desc] == 0x2C
    # graphics-control extension with a sub-block that promises 4 bytes
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    g_ext = bytes(g[:desc]) + ext + bytes(g[desc:])
    # cut inside the extension's declared sub-block
    with pytest.raises(ValueError, match="truncated GIF.*sub-block"):
        mm.decode_gif(g_ext[: desc + 4])


# --- time travel, driver-gradable (round-17 verdict item 6) ---------------

SF = "/root/testdata/sf0.001"


def test_layout_time_travel_serves_the_pre_second_batch_table(spark):
    """Row-level check behind the registered aggregates: after the
    entry's two fold commits, VERSION AS OF generation 0 is EXACTLY
    the even-event_id half of the corpus — every committed row, no
    later row — and latest is the whole table."""
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
        load_table,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
        layout,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators.artifacts import (
        app_scoped_dest,
    )
    from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.streaming import (
        zorder_stream as zs,
    )

    rows = {
        r["view"]: r.asDict()
        for r in layout.layout_time_travel(spark, SF).collect()
    }
    assert set(rows) == {"asof_g0", "latest", "delta"}
    ev = load_table(spark, SF, "events")
    n_even = ev.filter("event_id % 2 = 0").count()
    n = ev.count()
    assert rows["asof_g0"]["n_rows"] == n_even
    assert rows["latest"]["n_rows"] == n
    assert rows["delta"]["n_rows"] == n - n_even
    # row-level: asof gen 0 == the even half, exactly
    dest = app_scoped_dest(
        spark, SF, "/tmp/sparkgraft_timetravel", "events"
    )
    got = sorted(
        r["event_id"]
        for r in zs.clustered_table_asof(spark, dest, 0)
        .select("event_id")
        .collect()
    )
    want = sorted(
        r["event_id"]
        for r in ev.filter("event_id % 2 = 0").select("event_id").collect()
    )
    assert got == want
    # a second call in the same session is a pure read (idempotent):
    # same aggregates, no duplicate folds
    again = {
        r["view"]: r.asDict()
        for r in layout.layout_time_travel(spark, SF).collect()
    }
    assert again == rows
    # and a never-committed generation still raises the NAMED error
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="not servable"):
        zs.clustered_table_asof(spark, dest, 7)
