"""Vector quantization as storage-level column transforms.

Reference: crates/velesdb-core/src/quantization.rs:68-320 — SQ8 (per-vector
scalar quantization to int8, 4× smaller) and Binary (sign bits packed into
u64 words, 32× smaller) with quantized distance kernels. In Spark these are
column representations: quantize on write, score either on the dequantized
form (SQ8, approximate) or directly on packed bits (binary hamming via XOR +
bit_count). The reference's dual-precision rerank (f32 refine of quantized
candidates) maps to: filter/top-k on the quantized score, re-rank the small
candidate set on the full-precision column.

All expressions are JVM-side (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ------------------------------------------------------- query-time modes

# Reference defaults (index/hnsw/native/dual_precision.rs:46-55
# DualPrecisionConfig): oversample 4x for the coarse int8 phase; indexes
# below 10k vectors skip dual-precision entirely (f32 is already cheap).
DUAL_DEFAULT_OVERSAMPLING = 4
DUAL_MIN_INDEX_SIZE = 10_000


def parse_quantization_mode(s) -> str | None:
    """Case-insensitive quantization-mode aliases → canonical mode, the
    reference's QuantizationMode::parse (velesql/ast/with_clause.rs:24-35).
    Returns one of 'f32' | 'int8' | 'dual' | 'auto', or None if ``s`` is
    not a recognised mode string."""
    if not isinstance(s, str):
        return None
    return {
        "f32": "f32", "full": "f32", "exact": "f32",
        "int8": "int8", "sq8": "int8", "quantized": "int8",
        "dual": "dual", "hybrid": "dual",
        "auto": "auto", "default": "auto",
    }.get(s.lower())


# ------------------------------------------------------------------ SQ8

def sq8_quantize(vec: Column) -> Column:
    """array<float> → struct(mn, scale, codes array<int>) with 255 levels
    over the per-vector [min,max] range (quantization.rs SQ8)."""
    mn = F.array_min(vec).cast("double")
    mx = F.array_max(vec).cast("double")
    scale = F.when(mx > mn, (mx - mn) / 255.0).otherwise(F.lit(1.0))
    codes = F.transform(
        vec, lambda x: F.round((x.cast("double") - mn) / scale).cast("int"))
    return F.struct(mn.alias("mn"), scale.alias("scale"), codes.alias("codes"))


def sq8_dequantize(q: Column) -> Column:
    """struct(mn, scale, codes) → array<double> (lossy: ≤ scale/2 per dim)."""
    return F.transform(
        q.getField("codes"),
        lambda c: q.getField("mn") + c.cast("double") * q.getField("scale"))


# ------------------------------------------------------------------ binary

WORD_BITS = 64


def binary_quantize(vec: Column, dim: int) -> Column:
    """array<float> → array<bigint> of packed sign bits (x > 0 → 1), 64 per
    word (quantization.rs Binary mode, 32× compression)."""
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    words = []
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    for w in range(n_words):
        word = zero
        for b in range(min(WORD_BITS, dim - w * WORD_BITS)):
            i = w * WORD_BITS + b  # 0-based element index
            # shiftleft keeps bit 63 valid (1<<63 overflows a long literal)
            bit = F.when(F.element_at(vec, i + 1) > 0,
                         F.shiftleft(one, b)).otherwise(zero)
            word = word.bitwiseOR(bit)
        words.append(word)
    return F.array(*words)


def binary_unpack(packed: Column, dim: int) -> Column:
    """array<bigint> of packed sign bits → array<float> of 0/1 — the
    scoreable view of binary storage (hamming/jaccard on the unpacked
    array equals the packed XOR+popcount kernels). dim literal exprs;
    fine at embedding dims, document plan size at dim ≫ 4k."""
    one = F.lit(1).cast("bigint")
    return F.array(*[
        F.shiftrightunsigned(F.element_at(packed, i // WORD_BITS + 1),
                             i % WORD_BITS)
        .bitwiseAND(one).cast("float")
        for i in range(dim)])


def packed_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between packed bit arrays: Σ bit_count(a[i] XOR b[i])
    — the quantized SIMD kernel's semantics (quantization.rs / distance.rs),
    as a whole-stage-codegen expression."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def f16_pack(vec_series):
    """Half-precision storage (half_precision.rs): pandas_udf body packing
    ARRAY<FLOAT> → BINARY of little-endian f16 (2 bytes/dim, 2× smaller
    than f32 at ~1e-3 relative error). Arrow-batched; numpy does the
    conversion vectorized per batch."""
    import numpy as np
    import pandas as pd

    return pd.Series([
        None if v is None else np.asarray(v, dtype=np.float16).tobytes()
        for v in vec_series])


def f16_unpack(bin_series):
    """BINARY f16 → list[float32] (the dequantized read path)."""
    import numpy as np
    import pandas as pd

    return pd.Series([
        None if b is None else
        np.frombuffer(b, dtype=np.float16).astype(np.float32).tolist()
        for b in bin_series])


def f16_pack_udf():
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(f16_pack, "binary")


def f16_unpack_udf():
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(f16_unpack, "array<float>")
