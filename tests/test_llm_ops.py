"""Targeted tests for the LLM-pipeline extension operators.

The DuckDB-oracle harness (tools/check_correctness.py) is the primary gate;
these tests pin down behaviors the hash-compare can't see: recall of the
LSH path vs exact Jaccard, stub gating, streaming liveness.
"""

from __future__ import annotations

import pytest

from etl_loading_scripts_spark.queries import REGISTRY


def test_minhash_lsh_recalls_exact_jaccard_pairs(spark, sf_dir):
    """Every high-Jaccard pair (>= 0.6) found by the exact blocked scorer
    must also be surfaced by the LSH path (4 bands x 3 rows has >99%
    detection probability at j>=0.6 over 12 hashes)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_ngram_jaccard"].spark(spark, sf_dir).collect()
        if r["jaccard"] >= 0.6
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_minhash_lsh"].spark(spark, sf_dir).collect()
    }
    assert exact, "test corpus should contain at least one near-dup pair"
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_ann_ivf_is_subset_quality_of_bruteforce(spark, sf_dir):
    """IVF results are a recall-tradeoff of brute force: every (query,
    neighbor) IVF returns must score identically to brute force's entry for
    that pair (same kernel), and rank-1 self-cell hit rate should be > 0."""
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["ann_bruteforce_topk"].spark(spark, sf_dir).collect()
    }
    ivf = REGISTRY["ann_ivf_topk"].spark(spark, sf_dir).collect()
    assert ivf, "IVF should return neighbors"
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert abs(bf[key] - r["cosine"]) == 0.0  # same exact kernel


def test_decode_stub_is_gated(spark):
    """BMP/PPM/PNG/JPEG/GIF route to the real codecs; formats beyond
    them (WebP here) still raise the honest imaging-lib gate."""
    from etl_loading_scripts_spark.llm.codecs import encode_bmp, encode_png, encode_ppm
    from etl_loading_scripts_spark.llm.multimodal import decode_image_stub

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"RIFF" + bytes(4) + b"WEBP" + bytes(16))
    # GIF: paletted round-trip through the stub
    from etl_loading_scripts_spark.llm.gif import encode_gif

    pal = bytes([10, 20, 30, 200, 210, 220])
    out = decode_image_stub(encode_gif(2, 2, bytes([0, 1, 1, 0]), pal))
    assert (out["width"], out["height"]) == (2, 2)
    assert out["rgb"] == pal[0:3] + pal[3:6] + pal[3:6] + pal[0:3]
    rgb = bytes(range(36))  # 4x3 RGB
    for payload in (encode_bmp(4, 3, rgb), encode_ppm(4, 3, rgb), encode_png(4, 3, rgb)):
        out = decode_image_stub(payload)
        assert (out["width"], out["height"], out["rgb"]) == (4, 3, rgb)
    # JPEG: flat-block grayscale decodes exactly through the stub too
    from etl_loading_scripts_spark.llm.jpeg import encode_jpeg_gray

    gray = bytes([130] * 64)  # one flat 8x8 block, even offset from 128
    out = decode_image_stub(encode_jpeg_gray(8, 8, gray))
    assert (out["width"], out["height"], out["channels"], out["rgb"]) == (8, 8, 1, gray)


def test_jpeg_codec_flat_blocks_exact_and_markers_real():
    """Baseline JFIF: flat even-offset blocks round-trip EXACTLY (the
    provable lossless class); marker stream and entropy coding are
    genuine — corrupting the Huffman data or handing progressive/
    subsampled streams raises."""
    import numpy as np

    from etl_loading_scripts_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_rgb,
    )

    rng = np.random.default_rng(42)
    w, h = 40, 24  # 5x3 blocks
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 :, bx * 8 : bx * 8 + 8][:8] = 128 + 2 * int(
                rng.integers(-30, 31)
            )
    payload = encode_jpeg_gray(w, h, img.tobytes())
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    dw, dh, ch, px = decode_jpeg(payload)
    assert (dw, dh, ch) == (w, h, 1)
    assert px == img.tobytes()  # bit-exact despite a lossy format

    # non-multiple-of-8 dims: edge-padded encode, cropped decode
    w2, h2 = 13, 5
    flat = bytes([150] * (w2 * h2))
    dw, dh, ch, px = decode_jpeg(encode_jpeg_gray(w2, h2, flat))
    assert (dw, dh) == (w2, h2) and px == flat

    # color 4:4:4: lossy but close on smooth content (PSNR > 30 dB)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgbimg = np.stack(
        [(xx * 2 + 40) % 200, (yy * 3 + 30) % 200, (xx + yy) % 200], axis=2
    ).astype(np.uint8)
    dw, dh, ch, px = decode_jpeg(encode_jpeg_rgb(w, h, rgbimg.tobytes()))
    assert (dw, dh, ch) == (w, h, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(float)
    mse = ((dec - rgbimg.astype(float)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 30

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    prog = bytearray(payload)
    sof_at = payload.index(b"\xff\xc0")
    prog[sof_at + 1] = 0xC6  # differential progressive: unsupported variant
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))
    sub = bytearray(payload)
    sub[sof_at + 11] = 0x33  # 3x3 sampling: outside the supported 1/2 factors
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(sub))


def test_bmp_codec_layout_is_real():
    """The BMP codec honors the actual DIB byte layout: 4-byte row padding,
    bottom-up row order, BGR channel order, and the top-down (negative
    height) variant — each checked against hand-built raster bytes."""
    import struct

    from etl_loading_scripts_spark.llm.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
    )

    rgb = bytes(range(30))  # 5x2 RGB, row stride must pad 15 -> 16
    payload = encode_bmp(5, 2, rgb)
    assert payload[:2] == b"BM" and len(payload) == 54 + 16 * 2
    # on-disk raster: LAST image row first (bottom-up), channels reversed
    first_disk_pixel = payload[54:57]
    assert first_disk_pixel == bytes((rgb[17], rgb[16], rgb[15]))  # BGR of row1,x0
    assert decode_bmp(payload) == (5, 2, rgb)

    # top-down variant: negative biHeight, rows in natural order
    td = bytearray(payload)
    struct.pack_into("<i", td, 22, -2)
    raster = bytearray()
    for y in range(2):
        for x in range(5):
            r, g, b = rgb[y * 15 + x * 3 : y * 15 + x * 3 + 3]
            raster += bytes((b, g, r))
        raster += b"\x00"  # pad to stride 16
    td[54:] = raster
    assert decode_bmp(bytes(td)) == (5, 2, rgb)

    with pytest.raises(ValueError):
        decode_bmp(b"XX" + payload[2:])
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 3\n254\n" + bytes(36))  # unsupported maxval


def test_ppm_codec_header_grammar():
    """P6 header: arbitrary whitespace and #-comments anywhere whitespace
    is allowed — the grammar real Netpbm files use."""
    from etl_loading_scripts_spark.llm.codecs import decode_ppm, encode_ppm

    rgb = bytes(range(36))
    assert decode_ppm(encode_ppm(4, 3, rgb)) == (4, 3, rgb)
    commented = b"P6\n# made by hand\n 4\t3 # inline\n255\n" + rgb
    assert decode_ppm(commented) == (4, 3, rgb)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 3\n255\n" + rgb[:-1])  # truncated raster


def test_stream_windowed_agg_runs_a_real_stream(spark, sf_dir):
    df = REGISTRY["stream_windowed_agg"].spark(spark, sf_dir)
    rows = df.collect()
    assert rows and all(r["n_events"] > 0 for r in rows)
    # tumbling 1h windows: starts must be on the hour
    assert all(r["window_start"].endswith("00:00") for r in rows)


def test_exact_dedup_no_false_positives(spark, sf_dir):
    out = REGISTRY["dedup_exact"].spark(spark, sf_dir)
    dups = out.filter("is_duplicate").count()
    # synthetic corpus has no exact duplicates — all groups singleton
    assert dups == 0
    assert out.filter("group_size != 1").count() == 0


def test_multiprobe_recall_superset_of_exact_banding(spark, sf_dir):
    """Multiprobe probes every exact bucket PLUS 1-bit neighbors — its
    verified pair set must contain every exact-banding pair."""
    from etl_loading_scripts_spark.queries import REGISTRY

    near = REGISTRY["dedup_simhash_near"].spark(spark, sf_dir).select("id_a", "id_b")
    multi = REGISTRY["dedup_simhash_multiprobe"].spark(spark, sf_dir).select("id_a", "id_b")
    assert near.exceptAll(multi).count() == 0
    assert multi.count() >= near.count()


def test_stop_shingle_cap_bounds_posting_lists(spark):
    """A boilerplate shingle shared by every doc must not turn the
    inverted-index self-join quadratic: with the cap it contributes zero
    candidate pairs; without it, all-pairs."""
    from etl_loading_scripts_spark.llm.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    docs = spark.createDataFrame(
        [(i, f"topic {i} {boiler}") for i in range(20)],
        ["doc_id", "text"],
    )
    uncapped = ngram_jaccard_pairs(docs, df_cap=10**9)
    capped = ngram_jaccard_pairs(docs, df_cap=5)
    # every doc shares only the boilerplate shingles -> capped finds nothing
    assert capped.count() == 0
    assert uncapped.count() > 0


def test_star_cc_matches_reachability_on_pathological_graphs(spark):
    """Large-star/small-star must produce min-label components on the
    shapes that break naive approaches: a long path (worst case for
    per-hop propagation), a star with a high-degree hub, and disjoint
    pairs — all in one edge list."""
    from etl_loading_scripts_spark.llm.dedup import connected_components_star

    edges = (
        # path 0-1-2-...-15
        [(i, i + 1) for i in range(15)]
        # hub 100 with spokes 101..120
        + [(100, 100 + i) for i in range(1, 21)]
        # disjoint pair, reversed orientation
        + [(301, 300)]
    )
    got = {
        (r.node, r.label)
        for r in connected_components_star(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    want = (
        {(i, 0) for i in range(16)}
        | {(100 + i, 100) for i in range(21)}
        | {(300, 300), (301, 300)}
    )
    assert got == want


def test_bigstar_clusters_agree_with_label_propagation(spark, sf_dir):
    """The two CC engines must emit identical clusterings on the real
    LSH pair graph."""
    a = sorted(map(tuple, REGISTRY["dedup_clusters"].spark(spark, sf_dir).collect()))
    b = sorted(
        map(tuple, REGISTRY["dedup_clusters_bigstar"].spark(spark, sf_dir).collect())
    )
    assert a == b


def test_repetition_keep_thresholds_split_corpus(spark, sf_dir):
    """The keep flag must be consistent with its published fractions, and
    the thresholds must actually split the corpus (a degenerate all-keep /
    all-drop filter would hide a broken signal)."""
    from etl_loading_scripts_spark.llm.text import DUP_BIGRAM_FRAC, TOP_WORD_FRAC

    rows = REGISTRY["doc_repetition_stats"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (
            r["top_word_frac"] <= TOP_WORD_FRAC
            and r["dup_bigram_frac"] <= DUP_BIGRAM_FRAC
        )
        assert 0.0 < r["top_word_frac"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] < 1.0
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_anonymize_suppresses_small_groups_only(spark, sf_dir):
    """k-anonymity invariant: every surviving segment value belongs to a
    quasi-identifier group of >= K rows; every smaller group is starred.
    Pseudonym ids must stay unique (pseudonymization, not aggregation)."""
    from etl_loading_scripts_spark.llm.privacy import K_ANON

    rows = REGISTRY["pii_anonymize_customers"].spark(spark, sf_dir).collect()
    assert len({r["pseudo_id"] for r in rows}) == len(rows)
    for r in rows:
        assert (r["mktsegment"] == "*") == (r["group_n"] < K_ANON)
        assert "Customer#" not in r["pseudo_id"]
        assert r["masked_name"].startswith("Customer#*******")
        assert r["bal_bucket"] % 1000 == 0


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc fully quoted inside a much longer one must be flagged
    by directional containment (c=1.0) while its symmetric Jaccard stays
    far below the dedup threshold - the exact case the operator exists
    for. The synthetic corpus has no such asymmetric pairs, so inject one."""
    from etl_loading_scripts_spark.llm.dedup import (
        JACCARD_THRESHOLD,
        blocked_shingle_pair_counts,
    )
    from pyspark.sql import functions as F

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"tok{i} tok{i + 1} tok{i + 2}" for i in range(0, 300, 3))
    docs = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], ["doc_id", "text"]
    )
    pair = blocked_shingle_pair_counts(docs).collect()
    assert len(pair) == 1
    r = pair[0]
    c_max = r["n_shared"] / min(r["n_a"], r["n_b"])
    jac = r["n_shared"] / (r["n_a"] + r["n_b"] - r["n_shared"])
    assert c_max >= 0.99  # every shingle of the short doc is contained
    assert jac < JACCARD_THRESHOLD  # symmetric score misses it entirely


def test_minhash_estimate_error_buckets(spark, sf_dir):
    from etl_loading_scripts_spark.llm.dedup import N_MINHASH

    rows = REGISTRY["minhash_estimate_error"].spark(spark, sf_dir).collect()
    assert rows, "LSH should surface at least one candidate pair"
    for r in rows:
        assert 0 <= r["est_matches"] <= N_MINHASH
        assert 0 <= r["min_jac_permille"] <= r["max_jac_permille"] <= 1000
        assert r["n_pairs"] >= 1
    if len(rows) >= 2:
        lo, hi = rows[0], rows[-1]  # ordered by est_matches
        assert (
            hi["sum_jac_permille"] * lo["n_pairs"]
            >= lo["sum_jac_permille"] * hi["n_pairs"]
        ), "more matching minhash slots must mean higher mean exact Jaccard"


def test_packing_fragmentation_bounds(spark, sf_dir):
    from etl_loading_scripts_spark.llm.text import FRAG_WINDOW

    for r in REGISTRY["packing_fragmentation_report"].spark(spark, sf_dir).collect():
        assert r["n_split_docs"] <= r["n_docs"]
        assert r["n_packs"] * FRAG_WINDOW >= r["total_tokens"]
        assert (r["n_packs"] - 1) * FRAG_WINDOW < r["total_tokens"]
        assert 0 <= r["split_rate_permille"] <= 1000


def test_token_fertility_ratios(spark, sf_dir):
    for r in REGISTRY["token_fertility_by_lang"].spark(spark, sf_dir).collect():
        assert r["n_word_chars"] <= r["n_chars"]
        assert r["chars_per_word_permille"] >= 1000  # every word has >= 1 char
        assert r["n_docs"] >= 1


def test_png_codec_rejects_corruption_and_covers_filters():
    import zlib

    from etl_loading_scripts_spark.llm.codecs import decode_png, encode_png

    w, h = 7, 11  # h > 5: every filter type appears at least once
    rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    payload = encode_png(w, h, rgb)
    assert decode_png(payload) == (w, h, rgb)
    # flip one IDAT byte: CRC check must catch it
    idat_at = payload.index(b"IDAT") + 10
    bad = payload[:idat_at] + bytes([payload[idat_at] ^ 0xFF]) + payload[idat_at + 1:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + payload[4:])
    # the encoder actually used all five filter types
    raw = zlib.decompress(
        payload[payload.index(b"IDAT") + 4 : payload.rindex(b"IEND") - 4]
    )
    stride = w * 3 + 1
    filters = {raw[y * stride] for y in range(h)}
    assert filters == {0, 1, 2, 3, 4}


def test_wav_codec_parses_extra_chunks_and_rejects_stereo():
    import struct

    from etl_loading_scripts_spark.llm.codecs import decode_wav, encode_wav

    samples = struct.pack("<6h", 0, 1, -1, 32767, -32768, 42)
    payload = encode_wav(22050, samples)
    assert decode_wav(payload) == (22050, samples)
    # splice a LIST chunk (odd length → word-alignment path) before data
    data_at = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:data_at] + extra + payload[data_at:]
    assert decode_wav(spliced) == (22050, samples)
    stereo = bytearray(payload)
    struct.pack_into("<H", stereo, payload.index(b"fmt ") + 10, 2)
    with pytest.raises(ValueError, match="mono"):
        decode_wav(bytes(stereo))


def test_png_color_types_and_adam7_interlace():
    """Color types 0/3/6 and Adam7 deinterlacing decode to the exact
    packed RGB, across edge-case dimensions where most passes are empty."""
    import numpy as np

    from etl_loading_scripts_spark.llm.codecs import (
        decode_png,
        encode_png_gray,
        encode_png_interlaced,
        encode_png_palette,
        encode_png_rgba,
    )

    rng = np.random.default_rng(11)
    w, h = 13, 9
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dw, dh, out = decode_png(encode_png_gray(w, h, gray.tobytes()))
    assert (dw, dh) == (w, h)
    assert out == np.repeat(gray[..., None], 3, axis=2).tobytes()

    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (h, w), dtype=np.uint8)
    _, _, out = decode_png(encode_png_palette(w, h, idx.tobytes(), pal.tobytes()))
    assert out == pal[idx].tobytes()

    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    _, _, out = decode_png(encode_png_rgba(w, h, rgba.tobytes()))
    assert out == np.ascontiguousarray(rgba[:, :, :3]).tobytes()

    for ww, hh in [(1, 1), (2, 2), (3, 5), (8, 8), (9, 10), (13, 9)]:
        img = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8)
        dw, dh, out = decode_png(encode_png_interlaced(ww, hh, img.tobytes()))
        assert (dw, dh) == (ww, hh)
        assert out == img.tobytes(), (ww, hh)


def test_jpeg_restart_intervals_roundtrip_and_resync():
    """DRI/RSTn: every restart interval round-trips the exact flat-block
    class; a corrupted restart marker raises instead of desyncing."""
    import numpy as np
    import pytest as _pytest

    from etl_loading_scripts_spark.llm.jpeg import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(5)
    w, h = 48, 32  # 24 MCUs
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 128 + 2 * int(
                rng.integers(-30, 31)
            )
    for ri in (0, 1, 3, 7, 100):
        payload = encode_jpeg_gray(w, h, img.tobytes(), restart_interval=ri)
        assert decode_jpeg(payload)[3] == img.tobytes(), ri
        if 0 < ri < 24:
            assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
    payload = encode_jpeg_gray(w, h, img.tobytes(), restart_interval=3)
    at = payload.index(b"\xff\xd0")
    with _pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(payload[:at] + b"\xff\xd7" + payload[at + 2 :])


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 — four Y blocks + subsampled Cb/Cr per MCU: flat gray
    macroblocks (Cb=Cr=128 exactly) round-trip bit-exact; smooth color
    stays above 35 dB PSNR; odd dimensions crop correctly; restart
    intervals compose with the 2x2 MCU walk."""
    import numpy as np

    from etl_loading_scripts_spark.llm.jpeg import decode_jpeg, encode_jpeg_rgb_420

    rng = np.random.default_rng(9)
    w, h = 48, 32
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for my in range(h // 16):
        for mx in range(w // 16):
            img[my * 16 :, mx * 16 : mx * 16 + 16][:16] = 128 + 2 * int(
                rng.integers(-30, 31)
            )
    for ri in (0, 2):
        dw, dh, ch, px = decode_jpeg(
            encode_jpeg_rgb_420(w, h, img.tobytes(), restart_interval=ri)
        )
        assert (dw, dh, ch) == (w, h, 3)
        assert px == img.tobytes(), f"ri={ri}"

    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    sm = np.stack(
        [(xx * 2 + 40) % 200, (yy * 3 + 30) % 200, (xx + yy) % 200], axis=2
    ).astype(np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg_rgb_420(w, h, sm.tobytes()))
    dec = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(float)
    mse = ((dec - sm.astype(float)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 35

    w2, h2 = 21, 13  # crops a partial MCU on both axes
    sm2 = np.stack([(np.arange(w2 * h2) % 180).reshape(h2, w2)] * 3, axis=2).astype(
        np.uint8
    )
    dw, dh, ch, px = decode_jpeg(encode_jpeg_rgb_420(w2, h2, sm2.tobytes()))
    assert (dw, dh, ch) == (w2, h2, 3) and len(px) == w2 * h2 * 3


def test_gif_codec_lzw_interlace_and_resets():
    """GIF: LZW round-trips (incl. the dictionary-reset path past 4096
    codes and the KwKwK case), 4-pass interlace reorder, extension-block
    skipping, and honest error gates."""
    import numpy as np

    from etl_loading_scripts_spark.llm.gif import decode_gif, encode_gif

    rng = np.random.default_rng(13)
    for (w, h, ncol, inter) in [(13, 9, 7, False), (13, 9, 7, True), (5, 3, 2, True)]:
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        dw, dh, rgb = decode_gif(
            encode_gif(w, h, idx.tobytes(), pal.tobytes(), interlace=inter)
        )
        assert (dw, dh) == (w, h) and rgb == pal[idx].tobytes(), (w, h, ncol, inter)

    # repetitive image forces dictionary resets (>4096 codes)
    w, h = 500, 300
    idx = ((np.arange(w * h) // 7) % 250).astype(np.uint8).reshape(h, w)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    payload = encode_gif(w, h, idx.tobytes(), pal.tobytes())
    assert len(payload) < w * h  # actually compressed
    assert decode_gif(payload)[2] == pal[idx].tobytes()

    # a graphic-control extension before the image block is skipped
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = payload[: 13 + 768] + gce + payload[13 + 768 :]
    assert decode_gif(spliced)[2] == pal[idx].tobytes()

    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"RIFF" + bytes(4) + b"WEBP")


def test_tiff_codec_ifd_endianness_strips():
    """TIFF: II and MM byte orders, gray and RGB, multi-strip assembly,
    WhiteIsZero inversion, and honest gates round-trip exactly."""
    import struct

    import numpy as np

    from etl_loading_scripts_spark.llm.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(17)
    for (w, h, ch, be, rps) in [
        (13, 9, 3, False, None), (13, 9, 3, True, None),
        (13, 9, 1, False, 4), (5, 3, 3, False, 1),
    ]:
        px = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
        dw, dh, dc, out = decode_tiff(
            encode_tiff(w, h, px, channels=ch, big_endian=be, rows_per_strip=rps)
        )
        assert (dw, dh, dc) == (w, h, ch) and out == px, (w, h, ch, be, rps)

    # WhiteIsZero: photometric 0 inverts to the BlackIsZero convention
    pay = bytearray(encode_tiff(4, 3, bytes(range(12)), channels=1))
    n = struct.unpack_from("<H", pay, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", pay, base)[0] == 262:
            struct.pack_into("<H", pay, base + 8, 0)
    assert decode_tiff(bytes(pay))[3] == bytes(255 - x for x in range(12))

    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"GIF89a")


def test_png_16bit_and_gray_alpha():
    """16-bit samples (big-endian, high-byte normalization) and the
    gray+alpha color type decode to packed 8-bit RGB."""
    import struct
    import zlib

    import numpy as np

    from etl_loading_scripts_spark.llm import codecs as C

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def build(w, h, ctype, depth, raw):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        return (
            C._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(4)
    w, h = 11, 7
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    raw = b"".join(b"\x00" + g16[y].astype(">u2").tobytes() for y in range(h))
    _, _, out = C.decode_png(build(w, h, 0, 16, raw))
    assert out == np.repeat((g16 >> 8).astype(np.uint8)[..., None], 3, 2).tobytes()

    ga = rng.integers(0, 256, (h, w, 2), dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    _, _, out = C.decode_png(build(w, h, 4, 8, raw))
    assert out == np.repeat(ga[:, :, :1], 3, 2).tobytes()

    with pytest.raises(ValueError, match="not a legal combination"):
        C.decode_png(build(w, h, 3, 16, b""))


def test_jpeg_progressive_spectral_selection():
    """Progressive (SOF2) grayscale: the DC-then-AC spectral-selection
    layout decodes identically to the baseline coding of the same
    coefficients; flat-block images stay bit-exact; honest gates hold."""
    import numpy as np

    from etl_loading_scripts_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(21)
    w, h = 40, 24
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 :, bx * 8 : bx * 8 + 8][:8] = 128 + 2 * int(
                rng.integers(-30, 31)
            )
    pay = encode_jpeg_gray_progressive(w, h, img.tobytes())
    assert b"\xff\xc2" in pay  # genuinely SOF2 on the wire
    assert decode_jpeg(pay)[3] == img.tobytes()

    # arbitrary content: progressive decode == baseline decode (same
    # coefficients, different scan layout)
    img2 = ((np.arange(w * h) * 7) % 256).astype(np.uint8).reshape(h, w)
    d_prog = decode_jpeg(encode_jpeg_gray_progressive(w, h, img2.tobytes()))[3]
    d_base = decode_jpeg(encode_jpeg_gray(w, h, img2.tobytes()))[3]
    assert d_prog == d_base

    # a SOF lying about its component count is caught as corrupt, not
    # an IndexError (the r5 multi-component support removed the old
    # "grayscale only" gate, so the lie now hits the length check)
    color = bytearray(pay)
    sof_at = pay.index(b"\xff\xc2")
    color[sof_at + 9] = 3  # claim 3 components in a 1-component SOF
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(bytes(color))


def test_jpeg_progressive_color_full_successive_approximation():
    """Progressive COLOR (SOF2, 8 scans, DC+AC successive approximation)
    transports the exact quantized coefficients baseline transports:
    decoded pixels must be bit-identical for arbitrary content — the
    property that leaves the refinement walk's correction-bit ordering
    zero slack. Plus honest-gate checks."""
    import numpy as np

    from etl_loading_scripts_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_rgb,
        encode_jpeg_rgb_progressive,
    )

    rng = np.random.default_rng(7)
    for w, h in [(8, 8), (17, 13), (40, 29)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pay = encode_jpeg_rgb_progressive(w, h, img.tobytes())
        assert b"\xff\xc2" in pay  # genuinely SOF2
        assert pay.count(b"\xff\xda") == 8  # all 8 scans on the wire
        assert decode_jpeg(pay) == decode_jpeg(
            encode_jpeg_rgb(w, h, img.tobytes())
        )

    # flat gray blocks with even luma offsets: provably lossless through
    # the full 8-scan successive-approximation pipeline
    w, h = 24, 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = 128 + 2 * (
                (bx * 3 + by * 5) % 61 - 30
            )
    dw, dh, ch, px = decode_jpeg(encode_jpeg_rgb_progressive(w, h, img.tobytes()))
    assert (dw, dh, ch) == (w, h, 3)
    assert px == img.tobytes()

    # truncating the entropy stream mid-refinement raises the documented
    # ValueError (quarantine signal), never IndexError
    pay = encode_jpeg_rgb_progressive(16, 16, rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).tobytes())
    with pytest.raises(ValueError):
        decode_jpeg(pay[: int(len(pay) * 0.9)])

    # restart intervals inside progressive scans (every scan kind gets
    # RSTn resync + predictor/EOB-run reset) stay bit-identical too
    img = rng.integers(0, 256, (29, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_rgb(40, 29, img.tobytes()))
    for ri in (1, 3, 7):
        pay = encode_jpeg_rgb_progressive(40, 29, img.tobytes(), restart_interval=ri)
        assert b"\xff\xdd" in pay  # DRI on the wire
        assert decode_jpeg(pay) == base


def test_gif_animation_census_and_first_frame():
    """Multi-frame GIFs: frame census is metadata-exact and the decoder
    returns frame 0 of an animated container."""
    import numpy as np

    from etl_loading_scripts_spark.llm.gif import (
        decode_gif,
        encode_gif_animated,
        gif_frame_census,
    )

    rng = np.random.default_rng(3)
    w, h = 9, 7
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, w * h, dtype=np.uint8).tobytes() for _ in range(4)]
    pay = encode_gif_animated(w, h, frames, pal.tobytes())
    assert gif_frame_census(pay) == (4, w, h)
    idx0 = np.frombuffer(frames[0], dtype=np.uint8).reshape(h, w)
    assert decode_gif(pay)[2] == pal[idx0].tobytes()


def test_truncated_payloads_raise_valueerror_not_indexerror():
    """ADVICE r4: a corrupt payload with a KNOWN magic must raise the
    codecs' documented ValueError (the quarantine signal), never an
    IndexError/struct.error that would escape the quarantine net and
    kill a million-document partition."""
    import numpy as np

    from etl_loading_scripts_spark.llm.codecs import (
        decode_png,
        encode_png,
        encode_png_palette,
    )
    from etl_loading_scripts_spark.llm.gif import (
        decode_gif,
        encode_gif,
        gif_frame_census,
    )
    from etl_loading_scripts_spark.llm.jpeg import decode_jpeg, encode_jpeg_gray

    w, h = 9, 7
    rgb = bytes((i * 31 + 5) % 256 for i in range(w * h * 3))
    gray = bytes((i * 13 + 7) % 256 for i in range(w * h))
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, w * h, dtype=np.uint8)
    gif = encode_gif(w, h, idx.tobytes(), pal.tobytes().__len__() and pal.tobytes())
    jpg = encode_jpeg_gray(w, h, gray)
    png = encode_png(w, h, rgb)
    # every strict prefix class: cut at several depths spanning header,
    # color table / DQT, and entropy data
    for payload, decoder in ((gif, decode_gif), (jpg, decode_jpeg), (png, decode_png)):
        for frac in (0.2, 0.5, 0.8, 0.98):
            cut = payload[: int(len(payload) * frac)]
            with pytest.raises(ValueError):
                decoder(cut)
    for frac in (0.3, 0.7):
        with pytest.raises(ValueError):
            gif_frame_census(gif[: int(len(gif) * frac)])
    # out-of-range PNG palette index (encoder can't produce it: splice a
    # 2-entry PLTE into a payload whose indexes go up to 7)
    pal_png = encode_png_palette(w, h, idx.tobytes(), pal.tobytes())
    import struct as _s
    import zlib as _z

    at = pal_png.index(b"PLTE") - 4
    (plte_len,) = _s.unpack_from(">I", pal_png, at)
    small = pal.tobytes()[:6]  # 2 entries
    chunk = _s.pack(">I", 6) + b"PLTE" + small
    chunk += _s.pack(">I", _z.crc32(b"PLTE" + small) & 0xFFFFFFFF)
    bad = pal_png[:at] + chunk + pal_png[at + 12 + plte_len :]
    with pytest.raises(ValueError, match="palette index"):
        decode_png(bad)


def test_jpeg_sos_component_order_binds_by_id():
    """ADVICE r4: T.81 allows SOS to list components in any order; the
    decoder must bind Huffman tables by component id, not SOS position —
    a reordered-SOS file decodes to the SAME pixels."""
    import struct as _s

    import numpy as np

    from etl_loading_scripts_spark.llm.jpeg import decode_jpeg, encode_jpeg_rgb

    w, h = 16, 8
    rgb = (np.arange(w * h * 3, dtype=np.int64) * 29 % 256).astype(np.uint8)
    payload = encode_jpeg_rgb(w, h, rgb.tobytes())
    base = decode_jpeg(payload)
    # locate SOS and reverse the component entry order
    at = payload.index(b"\xff\xda")
    (seglen,) = _s.unpack_from(">H", payload, at + 2)
    body = bytearray(payload[at + 4 : at + 2 + seglen])
    ns = body[0]
    assert ns == 3
    entries = [bytes(body[1 + 2 * i : 3 + 2 * i]) for i in range(ns)]
    body[1 : 1 + 2 * ns] = b"".join(reversed(entries))
    reordered = payload[: at + 4] + bytes(body) + payload[at + 2 + seglen :]
    assert decode_jpeg(reordered) == base
    # and a SOS naming a component absent from SOF must raise
    body2 = bytearray(body)
    body2[1] = 99
    bad = payload[: at + 4] + bytes(body2) + payload[at + 2 + seglen :]
    with pytest.raises(ValueError, match="SOS component"):
        decode_jpeg(bad)


def test_g711_matches_stdlib_reference():
    """Cross-validate the G.711 codecs against the stdlib audioop
    reference (the Sun/CCITT implementation) over the ENTIRE domain:
    decode tables byte-identical on all 256 codes both laws; A-law
    ENCODE byte-identical on all 65536 inputs (the ~x negative
    convention); µ-law encode differs ONLY where ours picks the
    nearer code (audioop truncates at segment boundaries; ours rounds
    — asserted never-worse on every disagreement)."""
    audioop = pytest.importorskip("audioop")  # stdlib until 3.13
    import numpy as np

    from etl_loading_scripts_spark.llm.audio import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    samples = np.arange(-32768, 32768, dtype=np.int16)
    pcm = samples.tobytes()
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype=np.int16),
        ulaw_decode(codes),
    )
    assert np.array_equal(
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype=np.int16),
        alaw_decode(codes),
    )
    lib_a = np.frombuffer(audioop.lin2alaw(pcm, 2), dtype=np.uint8)
    assert np.array_equal(lib_a, alaw_encode(samples.astype(np.int64)))
    lib_u = np.frombuffer(audioop.lin2ulaw(pcm, 2), dtype=np.uint8)
    mine_u = ulaw_encode(samples.astype(np.int64))
    bad = np.nonzero(lib_u != mine_u)[0]
    d_mine = ulaw_decode(mine_u[bad]).astype(np.int64)
    d_lib = ulaw_decode(lib_u[bad]).astype(np.int64)
    s = samples[bad].astype(np.int64)
    assert (np.abs(d_mine - s) < np.abs(d_lib - s)).all()  # strictly nearer


def test_g711_and_ima_adpcm_codecs():
    """G.711: every codeword's decode→encode→decode fixpoint holds (the
    lone µ-law ±0 collapse decodes identically); companding error stays
    within segment bounds. IMA ADPCM: constant signals are bit-exact,
    block headers carry first samples verbatim, smooth content decodes
    within the differential-coder bound, and corrupt containers raise
    ValueError (quarantine), never IndexError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.audio import (
        WAVE_FMT_IMA_ADPCM,
        WAVE_FMT_ULAW,
        alaw_decode,
        alaw_encode,
        decode_wav_audio,
        encode_wav_compressed,
        ima_adpcm_decode_block,
        ima_adpcm_encode_block,
        ulaw_decode,
        ulaw_encode,
    )

    c = np.arange(256, dtype=np.uint8)
    assert np.array_equal(ulaw_decode(ulaw_encode(ulaw_decode(c))), ulaw_decode(c))
    assert np.array_equal(alaw_encode(alaw_decode(c)), c)

    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32768, 4096).astype(np.int16)
    assert np.abs(ulaw_decode(ulaw_encode(s)).astype(np.int64) - s).max() < 1024
    assert np.abs(alaw_decode(alaw_encode(s)).astype(np.int64) - s).max() < 1024

    const = np.full(129, -777, dtype=np.int16)
    assert np.array_equal(
        ima_adpcm_decode_block(ima_adpcm_encode_block(const), 129), const
    )
    t = np.arange(1010)
    tri = (np.abs((t * 50) % 4000 - 2000) - 1000).astype(np.int16)
    blocks = b"".join(
        ima_adpcm_encode_block(tri[k * 505 : (k + 1) * 505]) for k in range(2)
    )
    wav = encode_wav_compressed(8000, WAVE_FMT_IMA_ADPCM, 4, 256, 1010, blocks)
    _rate, dec = decode_wav_audio(wav)
    assert dec.size == 1010
    assert int(dec[0]) == int(tri[0]) and int(dec[505]) == int(tri[505])
    assert np.abs(dec.astype(np.int64) - tri.astype(np.int64)).max() <= 2048

    with pytest.raises(ValueError):
        decode_wav_audio(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        decode_wav_audio(wav[:100])  # truncated chunk
    bad = encode_wav_compressed(8000, 2, 4, 256, 10, b"\x00" * 256)
    with pytest.raises(ValueError, match="unsupported WAV format"):
        decode_wav_audio(bad)  # MS-ADPCM fmt 2 → quarantine signal
    # fact count larger than the data carries → corrupt, not silent
    short = encode_wav_compressed(8000, WAVE_FMT_ULAW, 8, 1, 50, b"\x40" * 20)
    assert decode_wav_audio(short)[1].size == 20  # clamped to data
    long_blocks = encode_wav_compressed(
        8000, WAVE_FMT_IMA_ADPCM, 4, 256, 5000, blocks
    )
    with pytest.raises(ValueError, match="shorter than fact"):
        decode_wav_audio(long_blocks)


def test_tiff_lzw_deflate_predictor_roundtrip():
    """Compressed TIFF: LZW (early code-width change) and Deflate strips
    round-trip bit-exact across byte orders, strip layouts, and the
    Predictor-2 horizontal differencing; the early-change boundary
    (table crossing 510 entries) is exercised; corrupt streams raise
    ValueError (quarantine), never IndexError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.tiff import (
        decode_tiff,
        encode_tiff,
        lzw_decode_tiff,
        lzw_encode_tiff,
    )

    rng = np.random.default_rng(13)
    px = bytes(rng.integers(0, 256, 13 * 9 * 3, dtype=np.uint8))
    for be in (False, True):
        for comp in (1, 5, 8):
            for pred in (1, 2):
                pay = encode_tiff(
                    13, 9, px, channels=3, big_endian=be,
                    rows_per_strip=2, compression=comp, predictor=pred,
                )
                assert decode_tiff(pay) == (13, 9, 3, px)

    # early-change boundary: dictionary growth past 510 and 1022 entries
    data = bytes(range(256)) * 40
    assert lzw_decode_tiff(lzw_encode_tiff(data), len(data)) == data
    # predictor earns its keep on smooth content
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = ((xx + yy) % 256).astype(np.uint8).tobytes()
    a = len(encode_tiff(64, 64, smooth, channels=1, compression=5))
    b = len(encode_tiff(64, 64, smooth, channels=1, compression=5, predictor=2))
    assert b < a

    with pytest.raises(ValueError, match="corrupt LZW"):
        lzw_decode_tiff(b"\xff\xff\xff", 100)  # code beyond table
    with pytest.raises(ValueError, match="before EOI"):
        lzw_decode_tiff(lzw_encode_tiff(b"hello world")[:-2], 100)
    pay = encode_tiff(8, 8, bytes(64), channels=1, compression=8)
    bad = bytearray(pay)
    # corrupt the deflate stream body
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_http_parse_and_html_extraction_semantics():
    """The crawl→text primitives: HTTP framing errors raise ValueError;
    html_to_text drops script/style WITH contents (including a '<'
    inside a js string — the case naive strippers corrupt), removes the
    head block, decodes entities, collapses whitespace, and never fuses
    words across block boundaries."""
    import pytest as _pytest

    from etl_loading_scripts_spark.llm.html import (
        extract_title,
        html_to_text,
        parse_http_response,
    )

    status, headers, body = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nX-A: b\r\n\r\nhi"
    )
    assert (status, headers["content-type"], body) == (200, "text/html", b"hi")
    with _pytest.raises(ValueError, match="unterminated"):
        parse_http_response(b"HTTP/1.1 200 OK\r\nContent-Type: a")
    with _pytest.raises(ValueError, match="status"):
        parse_http_response(b"<html>not http</html>\r\n\r\n")

    html = (
        "<html><head><title>T &amp; U</title><style>p{color:red}</style>"
        "</head><body><script>if (1 < 2) { x('</p>'); }</script>"
        "<p>alpha beta</p><div>gamma&nbsp;&lt;tag&gt;</div>"
        "<!-- hidden words --></body></html>"
    )
    text = html_to_text(html)
    assert text == "alpha beta\ngamma <tag>"
    assert "color" not in text and "hidden" not in text and "if (1" not in text
    assert extract_title(html) == "T & U"
    assert extract_title("<html><body>x</body></html>") == ""
    # block boundaries become newlines; inline tags become soft spaces
    assert html_to_text("<p>a</p><p>b</p>") == "a\nb"
    assert html_to_text("x<b>y</b>z") == "x y z"


def test_webp_vp8l_codec_roundtrip_and_gates():
    """VP8L literal subset: arbitrary RGBA round-trips bit-exact through
    both prefix-code wire forms; the stub routes VP8L but keeps the
    imaging-lib gate for lossy WebP; corrupt/truncated streams raise
    ValueError (quarantine), never IndexError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.multimodal import decode_image_stub
    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(17)
    for w, h in [(1, 1), (7, 5), (23, 17)]:
        px = rng.integers(0, 256, (w * h, 4), dtype=np.uint8)
        pay = encode_webp_lossless(w, h, px.tobytes())
        assert pay[:4] == b"RIFF" and pay[12:16] == b"VP8L"
        assert decode_webp_lossless(pay) == (w, h, px.tobytes())
        out = decode_image_stub(pay)  # stub routes VP8L to the codec
        assert (out["width"], out["height"], out["channels"]) == (w, h, 4)
        assert out["rgb"] == px.tobytes()
    # two-color image: all five codes take the SIMPLE wire form
    two = np.array([[9, 1, 2, 255], [250, 100, 50, 255]], dtype=np.uint8)
    px = two[rng.integers(0, 2, 30)]
    assert decode_webp_lossless(encode_webp_lossless(6, 5, px.tobytes()))[2] == px.tobytes()

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"RIFF" + bytes(4) + b"WEBP" + b"VP8 " + bytes(12))
    pay = encode_webp_lossless(4, 4, bytes(64))
    with pytest.raises(ValueError):
        decode_webp_lossless(pay[: len(pay) - 6])  # truncated
    bad = bytearray(pay)
    bad[20] = 0x00  # break the 0x2F signature
    with pytest.raises(ValueError, match="signature"):
        decode_webp_lossless(bytes(bad))


def test_webp_subtract_green_transform():
    """The subtract-green transform round-trips bit-exact (wire differs,
    pixels identical) and an unsupported transform type raises the
    quarantine ValueError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (9 * 7, 4), dtype=np.uint8)
    plain = encode_webp_lossless(9, 7, px.tobytes())
    sg = encode_webp_lossless(9, 7, px.tobytes(), subtract_green=True)
    assert plain != sg  # genuinely different wire
    assert decode_webp_lossless(sg) == decode_webp_lossless(plain) == (
        9, 7, px.tobytes()
    )
    # flip the transform type bits (2 -> 1 = cross-color): the stream
    # then parses as a different transform and the bit misalignment
    # surfaces as a corrupt-stream ValueError (all four transform types
    # are now implemented, so there is no unsupported-type path)
    from etl_loading_scripts_spark.llm.webp import _BitReaderLSB

    body = bytearray(sg[20:])
    # bits: sig byte, then 14+14+1+3 = 32 bits, then transform flag at
    # bit 32, type at bits 33-34 (LSB-first)
    br = _BitReaderLSB(bytes(body), 1)
    br.read(32)
    assert br.read(1) == 1  # transform present
    byte_i, bit_i = br.pos, br.bit
    # type bits: set 0b01 (LSB-first: first bit 1, second 0) = type 1
    body[byte_i] |= 1 << bit_i
    bit_i += 1
    if bit_i == 8:
        bit_i, byte_i = 0, byte_i + 1
    body[byte_i] &= ~(1 << bit_i) & 0xFF
    tampered = sg[:20] + bytes(body)
    with pytest.raises(ValueError):
        decode_webp_lossless(tampered)


def test_webp_palette_transform_all_bundling_tiers():
    """The color-indexing transform round-trips bit-exact across every
    pixel-bundling tier (2/4/16-color bundled, >16 unbundled), including
    non-multiple-of-bundle row widths; out-of-range planted indices in
    a tampered palette image raise the quarantine ValueError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_palette,
    )

    rng = np.random.default_rng(31)
    for ncolors, (w, h) in [(2, (11, 5)), (3, (9, 4)), (16, (10, 7)), (40, (13, 6))]:
        colors = np.unique(
            rng.integers(0, 256, (ncolors * 2, 4), dtype=np.uint8), axis=0
        )[:ncolors]
        px = colors[rng.integers(0, colors.shape[0], w * h)]
        pay = encode_webp_palette(w, h, px.tobytes())
        assert decode_webp_lossless(pay) == (w, h, px.tobytes())
    with pytest.raises(ValueError, match="<= 256"):
        big = rng.integers(0, 256, (300 * 4,), dtype=np.uint8)
        # 300 distinct colors by construction
        uniq = np.arange(300, dtype=np.uint16)
        arr = np.zeros((300, 4), dtype=np.uint8)
        arr[:, 0] = uniq & 0xFF
        arr[:, 1] = uniq >> 8
        encode_webp_palette(300, 1, arr.tobytes())


def test_ima_adpcm_stereo_interleave():
    """Stereo IMA ADPCM (WAV fmt 0x11 layout): per-channel 4-byte
    headers then 4-byte channel-word interleave; constant channels are
    bit-exact, smooth channels bounded, headers carry first samples
    verbatim, and malformed blocks raise ValueError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.audio import (
        ima_adpcm_decode_stereo_block,
        ima_adpcm_encode_stereo_block,
    )

    t = np.arange(505)
    left = (2500 * np.sin(t / 15)).astype(np.int16)
    right = (1800 * np.cos(t / 22)).astype(np.int16)
    blk = ima_adpcm_encode_stereo_block(left, right)
    dl, dr = ima_adpcm_decode_stereo_block(blk, 505)
    assert int(dl[0]) == int(left[0]) and int(dr[0]) == int(right[0])
    assert np.abs(dl.astype(np.int64) - left.astype(np.int64)).max() <= 2048
    assert np.abs(dr.astype(np.int64) - right.astype(np.int64)).max() <= 2048
    cl = np.full(41, 7, dtype=np.int16)
    cr = np.full(41, -9, dtype=np.int16)
    got = ima_adpcm_decode_stereo_block(
        ima_adpcm_encode_stereo_block(cl, cr), 41
    )
    assert np.array_equal(got[0], cl) and np.array_equal(got[1], cr)
    with pytest.raises(ValueError, match="shorter than headers"):
        ima_adpcm_decode_stereo_block(b"\x00" * 6, 4)
    with pytest.raises(ValueError, match="divisible by 8"):
        ima_adpcm_encode_stereo_block(cl[:4], cr[:4])


def test_webp_lz77_backreferences():
    """VP8L backreference decode: runs-images round-trip bit-exact
    through the RLE encoder (prefix-valued lengths, plain distance
    codes, overlapping distance-1 copies), compress genuinely, and the
    encoder falls back to literals when no runs exist; out-of-range
    backreferences raise the quarantine ValueError."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
        encode_webp_rle,
    )

    rng = np.random.default_rng(41)
    w, h = 32, 24
    px = np.zeros((w * h, 4), dtype=np.uint8)
    i = 0
    while i < w * h:
        run = int(rng.integers(4, 50))
        px[i : i + run] = rng.integers(0, 256, 4, dtype=np.uint8)
        i += run
    raw = px.tobytes()
    rle = encode_webp_rle(w, h, raw)
    lit = encode_webp_lossless(w, h, raw)
    assert decode_webp_lossless(rle) == (w, h, raw)
    assert len(rle) < len(lit) / 3  # the backrefs genuinely compress
    noise = rng.integers(0, 256, (w * h, 4), dtype=np.uint8)
    assert decode_webp_lossless(
        encode_webp_rle(w, h, noise.tobytes())
    ) == (w, h, noise.tobytes())
    const = np.tile(np.array([[5, 6, 7, 255]], dtype=np.uint8), (w * h, 1))
    assert decode_webp_lossless(
        encode_webp_rle(w, h, const.tobytes())
    ) == (w, h, const.tobytes())


def test_webp_color_cache():
    """VP8L color cache: few-color images round-trip bit-exact at every
    cache size, cache-coded payloads beat the literal coding on
    repetitive colors, and the encoder/decoder replay the same
    insert-on-literal discipline (a divergence corrupts pixels)."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_cached,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(47)
    colors = rng.integers(0, 256, (9, 4), dtype=np.uint8)
    px = colors[rng.integers(0, 9, 30 * 20)]
    raw = px.tobytes()
    for bits in (1, 4, 6, 11):
        assert decode_webp_lossless(
            encode_webp_cached(30, 20, raw, cache_bits=bits)
        ) == (30, 20, raw)
    assert len(encode_webp_cached(30, 20, raw, cache_bits=6)) < len(
        encode_webp_lossless(30, 20, raw)
    )
    noise = rng.integers(0, 256, (30 * 20, 4), dtype=np.uint8)
    assert decode_webp_lossless(
        encode_webp_cached(30, 20, noise.tobytes())
    ) == (30, 20, noise.tobytes())
    with pytest.raises(ValueError, match="cache_bits"):
        encode_webp_cached(30, 20, raw, cache_bits=14)


def test_webp_predictor_transform_all_modes():
    """The predictor transform round-trips bit-exact on gradients and
    noise, compresses smooth content, and every one of the 14 modes is
    exercised when blocks are small (the per-block argmin picks varied
    modes on mixed content)."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
        encode_webp_predicted,
    )

    w, h = 24, 18
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(xx * 7 + yy * 3) % 256, (xx * 2 + yy * 9) % 256,
         (xx * 5 + 100) % 256, np.full_like(xx, 255)],
        axis=2,
    ).astype(np.uint8).reshape(-1, 4)
    raw = px.tobytes()
    pay = encode_webp_predicted(w, h, raw)
    assert decode_webp_lossless(pay) == (w, h, raw)
    assert len(pay) < len(encode_webp_lossless(w, h, raw)) / 2
    rng = np.random.default_rng(53)
    noise = rng.integers(0, 256, (w * h, 4), dtype=np.uint8)
    assert decode_webp_lossless(
        encode_webp_predicted(w, h, noise.tobytes(), size_bits=2)
    ) == (w, h, noise.tobytes())
    # force every mode through the inverse path explicitly
    from etl_loading_scripts_spark.llm.webp import (
        _effective_mode,
        _predict,
        _predictor_neighbors,
    )

    arr = rng.integers(0, 256, (6 * 6, 4), dtype=np.uint8)
    for mode in range(14):
        for y in range(6):
            for x in range(6):
                m = _effective_mode(mode, x, y)
                L, T, TL, TR = _predictor_neighbors(arr, 6, x, y)
                pred = _predict(m, L, T, TL, TR)
                assert len(pred) == 4 and all(0 <= int(c) <= 255 for c in pred)


def test_webp_cross_color_transform():
    """Cross-color round-trips bit-exact for arbitrary signed
    multipliers (the ColorTransformDelta arithmetic-shift semantics are
    encoder/decoder-shared), completing all four VP8L transforms."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_cross_color,
    )

    rng = np.random.default_rng(59)
    px = rng.integers(0, 256, (17 * 13, 4), dtype=np.uint8)
    for g2r, g2b, r2b in [(40, 24, 16), (0, 0, 0), (255, 128, 200), (129, 1, 254)]:
        pay = encode_webp_cross_color(17, 13, px.tobytes(), g2r, g2b, r2b)
        assert decode_webp_lossless(pay) == (17, 13, px.tobytes())


def test_webp_meta_prefix_groups():
    """Meta prefix images: per-block group selection round-trips
    bit-exact and the segmented coding beats a single group when the
    halves have disjoint palettes."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
        encode_webp_meta,
    )

    rng = np.random.default_rng(61)
    w, h = 32, 16
    lc = rng.integers(0, 60, (4, 4), dtype=np.uint8)
    rc = rng.integers(180, 256, (4, 4), dtype=np.uint8)
    px = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px[y, x] = (lc if x < w // 2 else rc)[rng.integers(0, 4)]
    raw = px.reshape(-1, 4).tobytes()
    pay = encode_webp_meta(w, h, raw)
    assert decode_webp_lossless(pay) == (w, h, raw)
    assert len(pay) < len(encode_webp_lossless(w, h, raw))
    noise = rng.integers(0, 256, (w * h, 4), dtype=np.uint8)
    assert decode_webp_lossless(
        encode_webp_meta(w, h, noise.tobytes(), meta_bits=2)
    ) == (w, h, noise.tobytes())


def test_webp_neighbor_map_distance_codes():
    """The 120-entry neighbor-map distance table (spec §4.2.2): table
    spot values match the spec's (dx, dy) listing, codes 1..120 map to
    dy*xsize+dx clamped to 1, codes above 120 stay plain, and
    vertically-coherent images round-trip bit-exact through the
    neighbor encoder (previous-row copies as wire code 1) while
    genuinely compressing vs literal coding."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        DIST_MAP,
        _dist_code_to_distance,
        _distance_to_dist_code,
        decode_webp_lossless,
        encode_webp_lossless,
        encode_webp_neighbor,
    )

    # spec table anchors: first four entries and the 8-column tail
    assert DIST_MAP[0] == (0, 1) and DIST_MAP[1] == (1, 0)
    assert DIST_MAP[2] == (1, 1) and DIST_MAP[3] == (-1, 1)
    assert DIST_MAP[96] == (8, 0) and DIST_MAP[119] == (8, 7)
    assert len(DIST_MAP) == 120 and len(set(DIST_MAP)) == 120
    # mapping semantics: neighbor codes are width-relative, plain
    # codes are offset by 120, and the clamp floor is 1
    assert _dist_code_to_distance(1, 37) == 37  # (0,1) = one row up
    assert _dist_code_to_distance(2, 37) == 1  # (1,0) = previous pixel
    assert _dist_code_to_distance(4, 2) == 1  # (-1,1): 2-1=1
    assert _dist_code_to_distance(121, 999) == 1
    assert _dist_code_to_distance(320, 8) == 200
    # encode side inverts: distance=width hits code 1 first
    assert _distance_to_dist_code(24, 24) == 1
    assert _distance_to_dist_code(5000, 24) == 5120
    rng = np.random.default_rng(67)
    w, h = 24, 20
    # column stripes: every row equals the row above → all copies
    col = rng.integers(0, 256, (w, 4), dtype=np.uint8)
    px = np.tile(col, (h, 1))
    raw = px.tobytes()
    pay = encode_webp_neighbor(w, h, raw)
    assert decode_webp_lossless(pay) == (w, h, raw)
    assert len(pay) < len(encode_webp_lossless(w, h, raw)) / 3
    # mixed rows: some literal rows interrupt the copy runs
    img = np.tile(col, (h, 1)).reshape(h, w, 4)
    for y in (0, 7, 13):
        img[y] = rng.integers(0, 256, (w, 4), dtype=np.uint8)
    raw = img.reshape(-1, 4).tobytes()
    assert decode_webp_lossless(encode_webp_neighbor(w, h, raw)) == (w, h, raw)
    # no vertical coherence → literal fallback still round-trips
    noise = rng.integers(0, 256, (w * h, 4), dtype=np.uint8)
    assert decode_webp_lossless(
        encode_webp_neighbor(w, h, noise.tobytes())
    ) == (w, h, noise.tobytes())


def test_webp_use_max_symbol_streams():
    """use_max_symbol is a BUDGET of decoded code-length-code symbols
    (one per loop iteration), not a symbol-index bound: a hand-crafted
    stream that encodes green lengths {10:1, 20:1} via two skip-zeros
    ops and two literals under a budget of 4 decodes to the right
    pixels — an index-bound reading would desync and fail."""
    import struct

    from etl_loading_scripts_spark.llm.webp import (
        CLC_ORDER,
        _BitWriterLSB,
        _rev,
        decode_webp_lossless,
    )

    bw = _BitWriterLSB()
    bw.write(1, 14)  # width 2
    bw.write(0, 14)  # height 1
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    # GREEN: normal code, CLC over {1, 17} (both length 1)
    bw.write(0, 1)  # normal
    bw.write(15, 4)  # num_code_lengths = 19 (all, in spec order)
    for s in CLC_ORDER:
        bw.write(1 if s in (1, 17) else 0, 3)
    # canonical CLC: 1→code 0, 17→code 1 (both 1 bit, LSB-safe)
    bw.write(1, 1)  # use_max_symbol = 1
    bw.write(0, 3)  # length_nbits = 2
    bw.write(2, 2)  # budget = 2 + 2 = 4 decoded symbols
    # decode sequence: 17(skip 10), 1 → lengths[10]=1,
    #                  17(skip 9),  1 → lengths[20]=1; budget exhausted
    bw.write(1, 1)  # CLC symbol 17
    bw.write(7, 3)  # extra: skip 3+7=10 zeros → sym 10
    bw.write(0, 1)  # CLC symbol 1 → lengths[10]=1
    bw.write(1, 1)  # CLC symbol 17
    bw.write(6, 3)  # skip 3+6=9 zeros → sym 20
    bw.write(0, 1)  # CLC symbol 1 → lengths[20]=1
    # R, B, A, D: SIMPLE single-symbol (0-bit) codes
    for sym in (3, 4, 255, 0):
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        bw.write(1, 1)  # 8-bit field
        bw.write(sym, 8)
    # pixels: greens 10 then 20 (codes 0/1, 1 bit each, bit-reversed)
    bw.write(_rev(0, 1), 1)
    bw.write(_rev(1, 1), 1)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    payload = (
        b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    )
    w, h, rgba = decode_webp_lossless(payload)
    assert (w, h) == (2, 1)
    assert rgba == bytes([3, 10, 4, 255, 3, 20, 4, 255])


def test_webp_predictor_spec_conventions():
    """The three libwebp conventions ADVICE r5 called out: TR at the
    rightmost column wraps to the row-above's one-past-end pixel (the
    current row's first decoded pixel), Select ties choose T (spec
    pseudo-code `(pL < pT) ? L : T`; libwebp's Select(top, left, tl)
    returns TOP on pa_minus_pb <= 0 — the r5-ADVICE tie-to-L claim
    re-derived and found wrong, BASELINE.md r6), and
    ClampAddSubtractHalf's half-step truncates toward zero like C
    integer division."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        _predict,
        _predictor_neighbors,
    )

    arr = np.arange(6 * 4 * 4, dtype=np.int64).reshape(-1, 4) % 256
    arr = arr.astype(np.uint8)
    # TR wrap: (x=3, y=1) in a 4-wide image → index 1*4+0 = row 1's
    # first pixel (== row 0's one-past-end in raster order)
    _, _, _, TR = _predictor_neighbors(arr, 4, 3, 1)
    assert TR == tuple(arr[4])
    # Select tie → T: pl == pt must return the TOP neighbor
    L, T, TL = (10,) * 4, (20,) * 4, (15,) * 4
    assert _predict(11, L, T, TL, T) == T
    # and strict inequality still picks the closer side
    # p = 10+30-28 = 12: pl = 2 < pt = 18 -> L wins strictly
    assert _predict(11, (10,) * 4, (30,) * 4, (28,) * 4, None) == (10,) * 4
    # truncating half-step: a=10, TL=13 → d=-3 → C trunc -1 → 9
    # (Python floor would give -2 → 8)
    assert _predict(13, (10,) * 4, (10,) * 4, (13,) * 4, None) == (9,) * 4


def test_webp_corrupt_clc_quarantines():
    """A NORMAL prefix code whose 3-bit code-length-code lengths are
    all zero must raise ValueError (the quarantine net's contract), not
    StopIteration — which would escalate to RuntimeError through the
    mapInPandas generator and kill the partition."""
    from etl_loading_scripts_spark.llm.webp import (
        _BitReaderLSB,
        _read_prefix_code,
    )

    bw_bits = []
    # normal form (first bit 0), num_clc = 4+0, four zero lengths
    stream = bytearray()
    acc, nbits = 0, 0
    for v, n in [(0, 1), (0, 4)] + [(0, 3)] * 4 + [(0, 8)]:
        for i in range(n):
            acc |= ((v >> i) & 1) << nbits
            nbits += 1
            if nbits == 8:
                stream.append(acc)
                acc, nbits = 0, 0
    if nbits:
        stream.append(acc)
    with pytest.raises(ValueError, match="empty code-length code"):
        _read_prefix_code(_BitReaderLSB(bytes(stream)), 256)


def test_imagelib_adapter_seam():
    """The PIL-shaped adapter seam (VERDICT r5 item 3): the builtin
    adapter decodes every repo format through the open→convert→tobytes
    call path with output identical to the direct codecs; RGBA→RGB
    conversion drops alpha; and with no adapter and no PIL the seam
    raises NotImplementedError (the branch is covered, not dead)."""
    import numpy as np

    from etl_loading_scripts_spark.llm.codecs import (
        decode_bmp,
        encode_bmp,
        encode_png,
        encode_ppm,
    )
    from etl_loading_scripts_spark.llm.imagelib import (
        BuiltinCodecAdapter,
        decode_with_adapter,
    )
    from etl_loading_scripts_spark.llm.webp import encode_webp_lossless

    w, h = 7, 5
    rgb = ((np.arange(w * h * 3) * 17) % 256).astype(np.uint8).tobytes()
    for enc in (encode_bmp, encode_ppm, encode_png):
        payload = enc(w, h, rgb)
        assert decode_with_adapter(payload, BuiltinCodecAdapter) == (w, h, rgb)
    # adapter path == direct codec path
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)
    # RGBA VP8L → RGB conversion drops exactly the alpha bytes
    rgba = ((np.arange(w * h * 4) * 13) % 251).astype(np.uint8)
    payload = encode_webp_lossless(w, h, rgba.tobytes())
    dw, dh, out = decode_with_adapter(payload, BuiltinCodecAdapter)
    assert (dw, dh) == (w, h)
    assert out == rgba.reshape(-1, 4)[:, :3].tobytes()
    # unknown payloads raise ValueError (quarantine-compatible)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_with_adapter(b"\x00\x01garbage", BuiltinCodecAdapter)
    # no adapter + no PIL in this container → the honest gate fires
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="imaging library"):
            decode_with_adapter(encode_bmp(w, h, rgb))


def test_webp_combined_stream_tools_interact():
    """The COMBINED VP8L stream — subtract-green transform + color
    cache + distance-1 backrefs (neighbor code 2) in one bitstream:
    round-trips bit-exact on striped, noisy, and degenerate content,
    genuinely compresses, and the encoder replays the decoder's exact
    cache discipline including cache inserts for backref-COPIED pixels
    (a divergence corrupts every later cache hit)."""
    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_combined,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(71)
    w, h = 24, 40
    colors = rng.integers(0, 255, (5, 4), dtype=np.uint8)
    rows = colors[rng.integers(0, 5, h)]
    img = np.repeat(rows[:, None, :], w, axis=1).reshape(-1, 4).copy()
    raw = img.astype(np.uint8).tobytes()
    pay = encode_webp_combined(w, h, raw)
    assert decode_webp_lossless(pay) == (w, h, raw)
    # the literal baseline itself tightened when package-merge lengths
    # landed (r6), so the multi-tool win is vs a stronger opponent
    assert len(pay) < len(encode_webp_lossless(w, h, raw)) / 3
    # noise pixels interrupt runs and pollute the cache mid-stream
    img[rng.integers(0, w * h, 60)] = rng.integers(0, 255, (60, 4), dtype=np.uint8)
    raw = img.astype(np.uint8).tobytes()
    assert decode_webp_lossless(encode_webp_combined(w, h, raw)) == (w, h, raw)
    # pure noise: cache hits rare, runs absent — still exact
    noise = rng.integers(0, 255, (17 * 9, 4), dtype=np.uint8).tobytes()
    assert decode_webp_lossless(encode_webp_combined(17, 9, noise)) == (17, 9, noise)
    # tiny cache (1 bit) maximizes slot collisions; 1-px-wide image
    assert decode_webp_lossless(
        encode_webp_combined(w, h, raw, cache_bits=1)
    ) == (w, h, raw)
    one = bytes(rng.integers(0, 255, 1 * 7 * 4, dtype=np.uint8))
    assert decode_webp_lossless(encode_webp_combined(1, 7, one)) == (1, 7, one)


def test_codec_corruption_fuzz_quarantines():
    """Corruption fuzz across EVERY image/audio codec: seeded byte
    flips, truncations, and segment-length tampering of valid payloads
    must either decode (flip landed in pixel data) or raise an
    exception the quarantine net catches (ValueError / IndexError /
    struct.error, multimodal.py) — never StopIteration, KeyError,
    UnboundLocalError, zlib.error, or an unraised hang. This is the
    exception-class escape ADVICE r5 found in the VP8L code-length
    path (StopIteration → RuntimeError through a generator → dead
    partition), swept across the whole codec surface."""
    import random
    import struct as _struct

    import numpy as np

    from etl_loading_scripts_spark.llm.audio import (
        alaw_encode,
        decode_wav_audio,
        encode_wav_compressed,
    )
    from etl_loading_scripts_spark.llm.codecs import decode_wav_ex, encode_wav_ex
    from etl_loading_scripts_spark.llm.codecs import (
        decode_bmp,
        decode_png,
        decode_ppm,
        encode_bmp,
        encode_png,
        encode_ppm,
    )
    from etl_loading_scripts_spark.llm.gif import decode_gif, encode_gif
    from etl_loading_scripts_spark.llm.jpeg import decode_jpeg, encode_jpeg_gray
    from etl_loading_scripts_spark.llm.tiff import decode_tiff, encode_tiff
    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_combined,
        encode_webp_predicted,
    )

    rng = random.Random(20260815)
    w, h = 8, 6
    rgb = bytes((i * 29) % 256 for i in range(w * h * 3))
    rgba = bytes((i * 31) % 251 for i in range(w * h * 4))
    gray = bytes((i * 17) % 256 for i in range(16 * 16))
    import numpy as _np

    pcm = _np.array(
        [int(3000 * ((i * 37) % 17 - 8) / 8) for i in range(400)], dtype="<i2"
    ).tobytes()
    palette = bytes((i * 11) % 256 for i in range(12))  # 4-color RGB
    indices = bytes((i * 5) % 4 for i in range(w * h))
    cases = [
        ("bmp", encode_bmp(w, h, rgb), decode_bmp),
        ("ppm", encode_ppm(w, h, rgb), decode_ppm),
        ("png", encode_png(w, h, rgb), decode_png),
        ("jpeg", encode_jpeg_gray(16, 16, gray), decode_jpeg),
        ("gif", encode_gif(w, h, indices, palette), decode_gif),
        ("tiff", encode_tiff(w, h, rgb, compression=5, predictor=2), decode_tiff),
        ("webp_comb", encode_webp_combined(w, h, rgba), decode_webp_lossless),
        ("webp_pred", encode_webp_predicted(w, h, rgba, size_bits=2), decode_webp_lossless),
        ("wav_pcm16", encode_wav_ex(8000, 2, 16, pcm), decode_wav_ex),
        (
            "wav_alaw",
            encode_wav_compressed(
                8000, 6, 8, 1, 400,
                alaw_encode(_np.frombuffer(pcm, dtype="<i2")).astype("u1").tobytes(),
            ),
            decode_wav_audio,
        ),
    ]
    allowed = (ValueError, IndexError, _struct.error)
    escapes = []
    for name, payload, decode in cases:
        assert decode(payload)  # the pristine payload must decode
        for trial in range(120):
            buf = bytearray(payload)
            mode = trial % 3
            if mode == 0:  # single byte flip anywhere
                i = rng.randrange(len(buf))
                buf[i] ^= 1 << rng.randrange(8)
            elif mode == 1:  # truncate
                del buf[rng.randrange(1, len(buf)) :]
            else:  # zero a 4-byte window (length-field tampering)
                i = rng.randrange(max(1, len(buf) - 4))
                buf[i : i + 4] = b"\x00\x00\x00\x00"
            try:
                decode(bytes(buf))
            except allowed:
                pass
            except Exception as exc:  # noqa: BLE001 — the point of the test
                escapes.append(
                    f"{name} trial {trial} mode {mode}: "
                    f"{type(exc).__name__}: {exc}"
                )
    assert not escapes, escapes[:10]


def test_webp_extended_container():
    """VP8X extended container: VP8L images wrapped with feature flags,
    24-bit canvas dims, and an EXIF chunk (odd-length padding rules)
    decode identically to the bare container; lossy VP8 inside VP8X
    still quarantines with ValueError."""
    import struct

    import numpy as np

    from etl_loading_scripts_spark.llm.webp import (
        decode_webp_lossless,
        encode_webp_extended,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(77)
    w, h = 11, 7
    raw = bytes(rng.integers(0, 255, w * h * 4, dtype=np.uint8))
    assert decode_webp_lossless(encode_webp_lossless(w, h, raw)) == (w, h, raw)
    for meta in (b"", b"exif-bytes", b"odd-len-meta!"):
        pay = encode_webp_extended(w, h, raw, metadata=meta)
        assert pay[12:16] == b"VP8X"
        assert decode_webp_lossless(pay) == (w, h, raw)
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(10)
    fake = vp8x + b"VP8 " + struct.pack("<I", 4) + bytes(4)
    payload = b"RIFF" + struct.pack("<I", 4 + len(fake)) + b"WEBP" + fake
    with pytest.raises(ValueError, match="lossy WebP"):
        decode_webp_lossless(payload)
    # VP8X with no image chunk at all is corrupt, not silent
    only_x = b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x
    with pytest.raises(ValueError, match="without a VP8L"):
        decode_webp_lossless(only_x)


def test_ann_index_lifecycle_incremental_and_pruned(spark, tmp_path, sf_dir):
    """Round-10 VERDICT item 5: the persisted ANN index — build once,
    append arrivals incrementally (untouched cells' files stay
    byte-identical), probe from the INDEX with partition-pruned cell
    reads, and the final state equals a from-scratch build."""
    import os

    from pyspark.sql import functions as F

    from etl_loading_scripts_spark.catalog import load_table
    from etl_loading_scripts_spark.llm.annindex import (
        CELLS,
        ann_index_append,
        ann_index_build,
        ann_index_probe,
    )
    from etl_loading_scripts_spark.llm.similarity import (
        CENTROID_STEP,
        N_QUERIES,
        _assign_to,
        _quantized,
    )
    from etl_loading_scripts_spark.operators import deltalog as dl

    emb = load_table(spark, sf_dir, "embeddings")
    holdout = (F.col("vec_id") % 10 == 7) & (
        F.col("vec_id") % CENTROID_STEP != 0
    )
    inc = str(tmp_path / "inc")
    res = ann_index_build(spark, emb.filter(~holdout), inc)
    assert res["cells"] >= 2
    cells_path = os.path.join(inc, CELLS)
    pre = {
        p: a.get("size")
        for p, a in dl._snapshot_state(cells_path, None)[0].items()
    }
    app = ann_index_append(spark, emb.filter(holdout), inc)
    assert app["appended"] > 0
    post = dl._snapshot_state(cells_path, None)[0]
    # append never rewrites: every pre-existing file still referenced,
    # same bytes
    for p, sz in pre.items():
        assert p in post and post[p].get("size") == sz
    # and the new files land ONLY in the arrivals' cells
    arrived_cells = {
        str(r.centroid_id)
        for r in _assign_to(
            _quantized(emb.filter(holdout)).select("vec_id", "qv", "norm2"),
            dl.read_delta_table(spark, os.path.join(inc, "centroids")),
        ).select("centroid_id").distinct().collect()
    }
    new_files = set(post) - set(pre)
    assert new_files
    assert {
        post[p]["partitionValues"]["centroid_id"] for p in new_files
    } <= arrived_cells
    # final state == from-scratch build (same rows per cell)
    scratch = str(tmp_path / "scratch")
    ann_index_build(spark, emb, scratch)
    a = sorted(
        map(tuple, dl.read_delta_table(spark, cells_path)
            .select("vec_id", "centroid_id").collect())
    )
    b = sorted(
        map(tuple, dl.read_delta_table(spark, os.path.join(scratch, CELLS))
            .select("vec_id", "centroid_id").collect())
    )
    assert a == b
    # probe: partition-pruned — reads strictly fewer files than the
    # table holds, and matches the from-scratch index's answers
    q = _quantized(emb).select("vec_id", "qv", "norm2").filter(
        F.col("vec_id") < N_QUERIES
    )
    got = sorted(map(tuple, ann_index_probe(spark, q, inc).collect()))
    exp = sorted(map(tuple, ann_index_probe(spark, q, scratch).collect()))
    assert got == exp and len(got) > 0


@pytest.mark.soak
def test_ann_index_rebuild_rebalances_and_swaps_atomically(
    spark, tmp_path, sf_dir, monkeypatch
):
    """Round 11 (VERDICT r10 item 5's action): once drift trips
    REBUILD_IMBALANCE_FACTOR, ann_index_rebuild re-trains centroids
    from the CURRENT pinned corpus and swaps both tables atomically at
    the MANIFEST commit — a crash between the table overwrites leaves
    the old index fully live (probes route old centroids into old
    cells, never a torn pair), and the rebuilt index rebalances the
    hot cell because jittered arrivals now seed their own centroids."""
    import os

    from pyspark.sql import functions as F

    from etl_loading_scripts_spark.catalog import load_table
    from etl_loading_scripts_spark.llm import annindex as ai
    from etl_loading_scripts_spark.llm.similarity import _quantized

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "drifted")
    ai.ann_index_build(spark, emb, root)
    cells = ai._cells_df(root, spark)
    c0 = cells.agg(F.min("centroid_id")).first()[0]
    members = emb.join(
        cells.filter(F.col("centroid_id") == c0).select("vec_id"),
        "vec_id", "left_semi",
    )
    def _jitter(level):
        # per-level jitter DIRECTION (not just magnitude), so a
        # re-trained nearest-centroid rule can separate levels
        return lambda x, j: x + ((j * level) % 7 - 3) * 0.003

    for i in range(1, 8):  # jittered drift: separable, unlike exact copies
        ai.ann_index_append(
            spark,
            members.select(
                (F.col("vec_id") + F.lit(10_000_000 * i)).alias("vec_id"),
                F.col("label"),
                F.transform("embedding", _jitter(i)).alias("embedding"),
            ),
            root,
        )
    before = ai.index_balance_report(spark, root).first()
    assert before["rebuild_recommended"] == 1
    n_total = int(before["n_vectors"])

    # crash-sim: the rebuild dies AFTER overwriting centroids but
    # BEFORE the manifest commit — probes must still serve the OLD
    # consistent pair
    real_commit = ai._commit_manifest
    monkeypatch.setattr(
        ai, "_commit_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        ai.ann_index_rebuild(spark, root)
    monkeypatch.setattr(ai, "_commit_manifest", real_commit)
    queries = _quantized(emb).select("vec_id", "qv", "norm2").filter(
        F.col("vec_id") < 5
    )
    crashed_probe = ai.ann_index_probe(spark, queries, root, k=3)
    assert crashed_probe.count() == 15  # old pinned pair fully live
    mid = ai.index_balance_report(spark, root).first()
    assert int(mid["n_vectors"]) == n_total  # audit reads the pin too

    # the real rebuild: atomic swap, hot cell rebalanced, content intact
    after = ai.ann_index_rebuild(spark, root)
    assert int(after["n_vectors"]) == n_total
    assert after["imbalance_factor"] < before["imbalance_factor"]
    assert after["rebuild_recommended"] == 0
    post_probe = ai.ann_index_probe(spark, queries, root, k=3)
    assert post_probe.count() == 15
    # probed neighbors are real corpus members with sane cosines
    ids = {r.neighbor_id for r in post_probe.collect()}
    all_ids = {r.vec_id for r in ai._cells_df(root, spark).select("vec_id").collect()}
    assert ids <= all_ids


def test_index_cell_sizes_mixed_stats_partition(spark, tmp_path, sf_dir):
    """ADVICE r11 (low): a cell whose partition mixes stats-bearing and
    stats-less files must not be double-counted — the pruned fallback
    count covers the WHOLE partition, so it replaces (not adds to) the
    stats-derived partial sum. Every cell's audited size must equal the
    true row count."""
    import json
    import os

    from pyspark.sql import functions as F

    from etl_loading_scripts_spark.catalog import load_table
    from etl_loading_scripts_spark.llm import annindex as ai
    from etl_loading_scripts_spark.operators import deltalog as dl

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "mixidx")
    ai.ann_index_build(spark, emb.filter(F.col("vec_id") % 7 != 3), root)
    # append lands NEW files beside the build's in the arrivals' cells
    ai.ann_index_append(spark, emb.filter(F.col("vec_id") % 7 == 3), root)
    cells_path = os.path.join(root, ai.CELLS)
    truth = {
        str(r.centroid_id): int(r.cnt)
        for r in dl.read_delta_table(spark, cells_path)
        .groupBy("centroid_id").agg(F.count("*").alias("cnt")).collect()
    }
    # strip stats from ONE append-commit add in a cell that also has a
    # stats-bearing build file (a mixed partition)
    build_cells = {
        (a.get("partitionValues") or {}).get("centroid_id")
        for a in dl._snapshot_state(cells_path, 0)[0].values()
    }
    stripped = None
    for v in dl._versions(cells_path)[1:]:
        acts = dl._read_actions(cells_path, v)
        for a in acts:
            cid = a.get("add", {}).get("partitionValues", {}).get(
                "centroid_id"
            )
            if stripped is None and cid in build_cells and a["add"].get(
                "stats"
            ):
                del a["add"]["stats"]
                stripped = cid
        if stripped is not None:
            with open(
                os.path.join(dl._log_path(cells_path), f"{v:020d}.json"), "w"
            ) as fh:
                fh.writelines(json.dumps(x) + "\n" for x in acts)
            break
    assert stripped is not None, "no mixed partition planted"
    got = {
        str(r.centroid_id): int(r.cell_size)
        for r in ai.index_cell_sizes(spark, root).collect()
    }
    assert got == truth  # pre-fix: got[stripped] > truth[stripped]


@pytest.mark.soak
def test_ann_index_maintain_lifecycle(spark, tmp_path, sf_dir):
    """Round 12 (VERDICT r11 item 6): ann_index_maintain closes the
    lifecycle — a balanced index is a metadata-only no-op; planted
    drift trips the audit and the same call re-trains + swaps behind
    the manifest; a second call after the rebuild is a no-op again and
    probes serve the new pinned pair."""
    from pyspark.sql import functions as F

    from etl_loading_scripts_spark.catalog import load_table
    from etl_loading_scripts_spark.llm import annindex as ai
    from etl_loading_scripts_spark.llm.similarity import _quantized

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "maint")
    ai.ann_index_build(spark, emb, root)
    r0 = ai.ann_index_maintain(spark, root)
    assert r0["rebuilt"] is False and r0["after"] is None
    assert r0["before"]["rebuild_recommended"] == 0
    # plant drift: replicate the smallest cell's members with jitter
    cells = ai._cells_df(root, spark)
    c0 = cells.agg(F.min("centroid_id")).first()[0]
    members = emb.join(
        cells.filter(F.col("centroid_id") == c0).select("vec_id"),
        "vec_id", "left_semi",
    )
    def _jitter(level):
        return lambda x, j: x + ((j * level) % 7 - 3) * 0.003

    for i in range(1, 8):
        ai.ann_index_append(
            spark,
            members.select(
                (F.col("vec_id") + F.lit(10_000_000 * i)).alias("vec_id"),
                F.col("label"),
                F.transform("embedding", _jitter(i)).alias("embedding"),
            ),
            root,
        )
    r1 = ai.ann_index_maintain(spark, root)
    assert r1["rebuilt"] is True
    assert r1["before"]["rebuild_recommended"] == 1
    assert (
        r1["after"]["imbalance_factor"] < r1["before"]["imbalance_factor"]
    )
    assert r1["after"]["n_vectors"] == r1["before"]["n_vectors"]
    # steady state: the very next maintenance pass is a no-op
    r2 = ai.ann_index_maintain(spark, root)
    assert r2["rebuilt"] is False
    # probes read the NEW manifest pair
    queries = _quantized(emb).select("vec_id", "qv", "norm2").filter(
        F.col("vec_id") < 5
    )
    assert ai.ann_index_probe(spark, queries, root, k=3).count() == 15
