"""Document-frequency-driven term treatment.

The reference maps IdfX10 → RowConfiguration — rare terms get more rows at
higher rank, ultra-common terms a private rank-0 row; pluggable policies
(TreatmentClassicBitsliced / TreatmentPrivateRank0 / ... / TreatmentOptimal
— /root/reference/inc/BitFunnel/Index/ITermTreatment.h:39-123,
src/Index/src/TreatmentPrivateSharedRank0And3.cpp:32-90,
TreatmentOptimal.cpp:37-318).

Our exact-index analogue routes df bands to posting *encodings*, CONSUMED
by the segment encoder (operators/segments._encode_posting_arrays routes
each term run to raw/vb/gap32 doc encodings from its group-local df
fraction — slice is a uniform doc hash, so the local fraction estimates the
global df/N without a dictionary pass) and by the query kernels
(plans/wand.driver_order demotes dense lists from driving intersections):

- RARE  (df/N < rare_df_frac): short plain int64 doc-id arrays — a single
  block, no compression benefit at this size, minimal decode cost. The
  analogue of the reference's "adhoc" terms whose stats aren't individually
  tracked (TermTable.cpp:395-427).
- MID   (otherwise): delta + varbyte blocks with per-block max metadata
  (block-max WAND skipping — the rank-down analogue).
- DENSE (df/N > dense_df_frac): long lists where the block structure matters
  most; candidates for bitmap encoding and for intersection-driver demotion
  (never chosen as the galloping driver). The analogue of the reference's
  private rank-0 rows for very common terms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bitfunnel_spark.config import BuildConfig

RARE, MID, DENSE = "rare", "mid", "dense"


def treatment_of(df_col: Column, n_docs: int, config: BuildConfig) -> Column:
    frac = df_col.cast("double") / float(max(n_docs, 1))
    return (
        F.when(frac < config.rare_df_frac, F.lit(RARE))
        .when(frac > config.dense_df_frac, F.lit(DENSE))
        .otherwise(F.lit(MID))
    )


def treatment_of_py(df: int, n_docs: int, config: BuildConfig) -> str:
    """Driver/kernel-side mirror of :func:`treatment_of`."""
    frac = df / max(n_docs, 1)
    if frac < config.rare_df_frac:
        return RARE
    if frac > config.dense_df_frac:
        return DENSE
    return MID
