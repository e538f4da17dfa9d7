"""dHash perceptual image hashing (multimodal/imagehash.py)."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from velesdb_spark.multimodal.imagehash import (dhash_bits, dhash_images,
                                                dhash_near_dups)
from velesdb_spark.multimodal.media import png_pixels, synth_png


def _naive_dhash(px):
    h, w, ch = px.shape
    p = px.astype(np.int64)
    lum = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
           if ch >= 3 else 1000 * p[..., 0])
    val = 0
    for r in range(8):
        for c in range(8):
            def cell(rr, cc):
                ys = [y for y in range(h) if (y * 8) // h == rr]
                xs = [x for x in range(w) if (x * 9) // w == cc]
                vals = [int(lum[y, x]) for y in ys for x in xs]
                return sum(vals), len(vals)
            s1, n1 = cell(r, c)
            s2, n2 = cell(r, c + 1)
            if s2 * n1 > s1 * n2:
                val |= 1 << (r * 8 + c)
    return val


def test_dhash_matches_naive_rgb_and_sizes():
    for seed, (w, h) in [(0, (12, 10)), (7, (24, 16)), (42, (9, 8))]:
        png, px = synth_png(seed, w=w, h=h)
        assert dhash_bits(png_pixels(png)) == _naive_dhash(px)


def test_dhash_gray_channel():
    png, px = synth_png(3, channels=1)
    assert dhash_bits(png_pixels(png)) == _naive_dhash(px)


def test_dhash_too_small_raises():
    png, _ = synth_png(1, w=8, h=6)
    with pytest.raises(ValueError, match="smaller than"):
        dhash_bits(png_pixels(png))


def test_brightness_shift_is_near_not_exact():
    """A +delta (mod 251) global shift preserves most gradients: only
    wrapped pixels flip bits, so the twin lands near in Hamming space
    while a different seed lands far."""
    base = dhash_bits(png_pixels(synth_png(11, w=24, h=24)[0]))
    # seed' = seed + delta * inverse(7) mod 251 shifts every pixel +delta
    inv7 = pow(7, -1, 251)
    twin = dhash_bits(png_pixels(
        synth_png(11 + (3 * inv7) % 251, w=24, h=24)[0]))
    far = dhash_bits(png_pixels(synth_png(150, w=24, h=24)[0]))
    d_twin = bin(base ^ twin).count("1")
    d_far = bin(base ^ far).count("1")
    assert d_twin < d_far
    assert d_twin > 0  # genuinely near, not exact


def test_dhash_images_dataframe(spark):
    rows = [(i, bytearray(synth_png(i)[0])) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: r["dhash"] for r in dhash_images(df).collect()}
    for i in range(8):
        v = _naive_dhash(synth_png(i)[1])
        signed = v - (1 << 64) if v >= 1 << 63 else v
        assert got[i] == signed, i


def test_near_dups_differential_vs_brute_force(spark):
    """Banded join + popcount verify == brute-force all-pairs, on random
    hashes with planted near pairs (including sign-bit hashes)."""
    rng = random.Random(7)
    hashes = {}
    for i in range(60):
        hashes[i] = rng.getrandbits(64)
    # plant near pairs at hamming 1..3 and one exact twin
    for j, d in [(60, 1), (61, 2), (62, 3), (63, 0)]:
        base = hashes[j - 60]
        v = base
        for b in rng.sample(range(64), d):
            v ^= 1 << b
        hashes[j] = v
    rows = [(i, v - (1 << 64) if v >= 1 << 63 else v)
            for i, v in hashes.items()]
    df = spark.createDataFrame(rows, "id long, dhash long")
    got = sorted((r["id_a"], r["id_b"], r["hamming"])
                 for r in dhash_near_dups(df, max_hamming=3).collect())
    want = sorted(
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3)
    assert got == want
    planted = {(3, 63, 0), (0, 60, 1), (1, 61, 2), (2, 62, 3)}
    assert planted <= {(min(a, b), max(a, b), h) for a, b, h in got}


def test_near_dups_guards(spark):
    df = spark.createDataFrame([(1, 0)], "id long, dhash long")
    with pytest.raises(ValueError, match="divide 64"):
        dhash_near_dups(df, n_bands=5)
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_dups(df, max_hamming=4, n_bands=4)


def test_near_dups_no_image_bytes_in_shuffle(spark):
    """Plan contract: every shuffle carries (id, hash, band) scalars
    only — the candidate join partitions on (band, val) and the binary
    content column never appears in an Exchange's partitioning keys."""
    rows = [(i, bytearray(synth_png(i % 3)[0])) for i in range(9)]
    media = spark.createDataFrame(rows, "id long, content binary")
    plan = dhash_near_dups(dhash_images(media))._jdf \
        .queryExecution().executedPlan().toString()
    exch = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert any("band" in ln and "val" in ln for ln in exch)
    assert all("content" not in ln for ln in exch)


def test_near_dups_pigeonhole_at_other_band_widths(spark):
    """8×8-bit bands must give exact recall for hamming ≤ 7; 2×32-bit
    for hamming ≤ 1 — brute-force differential at each config."""
    rng = random.Random(21)
    hashes = {i: rng.getrandbits(64) for i in range(40)}
    for j, d in [(40, 7), (41, 5), (42, 1)]:
        v = hashes[j - 40]
        for b in rng.sample(range(64), d):
            v ^= 1 << b
        hashes[j] = v
    rows = [(i, v - (1 << 64) if v >= 1 << 63 else v)
            for i, v in hashes.items()]
    df = spark.createDataFrame(rows, "id long, dhash long")
    for n_bands, max_h in ((8, 7), (2, 1)):
        got = sorted((r["id_a"], r["id_b"], r["hamming"])
                     for r in dhash_near_dups(
                         df, max_hamming=max_h, n_bands=n_bands).collect())
        want = sorted(
            (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
            for a, b in itertools.combinations(sorted(hashes), 2)
            if bin(hashes[a] ^ hashes[b]).count("1") <= max_h)
        assert got == want, (n_bands, max_h)


def test_near_dups_decode_staged_once(spark):
    """r11 optimization contract: the banded self-join's two sides must
    read the staged (id, dhash) cache, not re-run the image decode —
    un-staged, the MapInPandas hashing pipeline executed once per join
    side. Both join inputs must be InMemoryTableScans over one shared
    relation."""
    rows = [(i, bytearray(synth_png(i % 3)[0])) for i in range(9)]
    media = spark.createDataFrame(rows, "id long, content binary")
    out = dhash_near_dups(dhash_images(media))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("InMemoryRelation") >= 2, plan
    from velesdb_spark.functions.staging import release_staged
    release_staged()
