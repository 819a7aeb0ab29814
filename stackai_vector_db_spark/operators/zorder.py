"""Z-order (Morton) multi-dimensional clustering — the declarative
replacement for the reference's KD-tree.

The reference's KD-tree (``app/indexes/kdtree.py:48-102``) exists to prune
low-dimensional range/nearest scans: a pointer-chasing recursive structure,
explicitly capped at dim ≤ 20 (``kdtree.py:34-38``) and sequential by
construction — an anti-pattern on Spark (SURVEY.md §4.1 drops it). Its
*pruning contract* survives declaratively: interleave the bits of the
quantized dimensions into one integer key (Morton code), range-partition
and sort the table by that key at write time, and points close in the
key's 1-D order are close in k-D space. A k-D box query then becomes a 1-D
key range + an exact refine filter:

- **superset interval**: every point inside box ``[lo, hi]`` has a Morton
  code within ``[z(lo_corner), z(hi_corner)]`` (Tropf & Herzog, "Multi-
  dimensional Range Search in Dynamically Balanced Trees", 1981 — the same
  interval Delta Lake's OPTIMIZE ZORDER exploits). The interval admits
  false positives, never false negatives; the exact per-dim predicates
  refine them away, so results are IDENTICAL to a naive box filter.
- **pruning**: on a z-ordered layout the key range maps to a contiguous
  run of files/row-groups — parquet min/max stats skip the rest. At 100 TB
  this is the KD-tree's O(log N) branch-skip re-expressed as data layout:
  no tree, no pointers, no driver-side structure, and it composes with
  every other DataFrame operator.

Quantization uses FIXED domain bounds (not data min/max — that would cost
a pass and make keys layout-dependent). Both the column expression and the
driver-side corner quantizer mirror the same IEEE-double arithmetic, so
corner codes and row codes are always consistent (monotonicity of the
shared quantizer is what the superset property needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 8


def _quantize_col(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamped linear quantization to [0, 2^bits) — mirrors _quantize_val."""
    n_max = (1 << bits) - 1
    scaled = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << bits)))
    return F.least(F.lit(n_max), F.greatest(F.lit(0), scaled.cast("int")))


def _quantize_val(v: float, lo: float, hi: float, bits: int) -> int:
    """Driver-side twin of _quantize_col — identical op order on IEEE
    doubles, so a box corner and an equal-valued row quantize identically."""
    import math

    n_max = (1 << bits) - 1
    scaled = int(math.floor((v - lo) / (hi - lo) * float(1 << bits)))
    return min(n_max, max(0, scaled))


def zorder_key(
    specs: list[tuple[Column | str, float, float]], bits: int = DEFAULT_BITS
) -> Column:
    """Morton code of ``[(col, domain_lo, domain_hi), ...]`` as a LONG.

    Bit layout: bit ``b`` of quantized dim ``d`` lands at position
    ``b * n_dims + d`` — dimension-major interleave, the classic Morton
    layout. Pure JVM-side integer arithmetic (shift/and/or), no UDF;
    ``bits * n_dims`` terms stay inside whole-stage codegen.
    """
    n_dims = len(specs)
    if n_dims * bits > 63:
        raise ValueError(f"{n_dims} dims x {bits} bits exceeds a signed long")
    terms = []
    for d, (col, lo, hi) in enumerate(specs):
        q = _quantize_col(F.col(col) if isinstance(col, str) else col, lo, hi, bits)
        q = q.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n_dims + d)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_interval(
    specs: list[tuple[str, float, float]],
    box: list[tuple[float, float]],
    bits: int = DEFAULT_BITS,
) -> tuple[int, int]:
    """[z(lo_corner), z(hi_corner)] — the superset key interval for a box."""
    n_dims = len(specs)
    z_lo = z_hi = 0
    for d, ((_, dlo, dhi), (blo, bhi)) in enumerate(zip(specs, box)):
        q_lo = _quantize_val(blo, dlo, dhi, bits)
        q_hi = _quantize_val(bhi, dlo, dhi, bits)
        for b in range(bits):
            z_lo |= ((q_lo >> b) & 1) << (b * n_dims + d)
            z_hi |= ((q_hi >> b) & 1) << (b * n_dims + d)
    return z_lo, z_hi


def box_filter(
    df: DataFrame,
    specs: list[tuple[str, float, float]],
    box: list[tuple[float, float]],
    bits: int = DEFAULT_BITS,
    zkey_col: str | None = None,
) -> DataFrame:
    """Box query = coarse Morton-interval prune + exact refine.

    If ``zkey_col`` names a STORED key column (z-ordered layout), the
    interval predicate pushes into the parquet scan and skips files /
    row-groups; otherwise the key is computed inline (no pruning, same
    semantics). The exact per-dim predicates make the result identical to
    a naive box filter — the interval only narrows what is READ.
    """
    z_lo, z_hi = zorder_interval(specs, box, bits)
    zk = F.col(zkey_col) if zkey_col else zorder_key(list(specs), bits)
    out = df.filter((zk >= F.lit(z_lo)) & (zk <= F.lit(z_hi)))
    for (col, _, _), (blo, bhi) in zip(specs, box):
        out = out.filter((F.col(col) >= F.lit(blo)) & (F.col(col) <= F.lit(bhi)))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    specs: list[tuple[str, float, float]],
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
    zkey_col: str = "zkey",
) -> None:
    """Persist ``df`` clustered by Morton key: range-partition into
    ``n_files`` key ranges, sort within each, write parquet. Every file
    (and row-group) then covers a tight zkey interval, so a pushed
    ``zkey BETWEEN`` predicate skips non-overlapping files via column
    stats — the KD-tree's branch pruning as a storage property."""
    (
        df.withColumn(zkey_col, zorder_key(list(specs), bits))
        .repartitionByRange(n_files, zkey_col)
        .sortWithinPartitions(zkey_col)
        .write.mode("overwrite")
        .parquet(path)
    )
