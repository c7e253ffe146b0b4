"""Multi-column zone-map pruning scale smoke (r14, VERDICT r13 ask #8).

``zone_map_multicol_pruning`` proves conjunctive multi-column pruning
CORRECT; this measures the 100-TB payoff: with files laid out as
(partition value, sort band) cells, a 2-dimensional range predicate
touches only the cells it names — the scanned-file count is set by the
predicate's selectivity in BOTH dimensions and stays a constant
FRACTION as the table grows, while a 1-column zone map can only prune
one dimension.

Per shape R in (1, 4, 16):
- orders (sf0.1) replicated Rx, committed one file per
  (2-year partition bucket, R x 3 totalprice bands) cell with
  ``stats_cols=["o_ybin", "o_totalprice"]`` — more replication = more
  bands = finer files, the way a growing table accretes files;
- a fixed predicate (ybin in [1, 2] AND totalprice in
  [150k, 380k]) runs via read_table_pruned with BOTH predicates,
  with ONLY the date-partition predicate, and as a full scan;
- reported: files_total, files scanned by 2-col vs 1-col pruning, and
  result equality.

Usage: python tools/scale_smoke_zonemap_multi.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from automated_etl_pipeline_spark.io.manifest import (  # noqa: E402
    commit_append,
    read_table,
    read_table_pruned,
)
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402

Y_LO, Y_HI = 1, 2
P_LO, P_HI = 150000.0, 380000.0


def build_table(spark, sf_dir: str, rep: int, root: str) -> int:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    )
    if rep > 1:
        orders = orders.crossJoin(spark.range(rep)).drop("id")
    band_width = 600000.0 / (3 * rep)  # finer bands as the table grows
    binned = orders.select(
        F.floor((F.year("o_orderdate") - F.lit(1992)) / F.lit(2.0))
        .cast("long")
        .alias("o_ybin"),
        F.floor(F.col("o_totalprice") / F.lit(band_width))
        .cast("long")
        .alias("o_band"),
        "o_totalprice",
    ).localCheckpoint(eager=True)
    cells = sorted(
        (r["o_ybin"], r["o_band"])
        for r in binned.select("o_ybin", "o_band").distinct().collect()
    )
    for yb, bd in cells:
        commit_append(
            binned.filter((F.col("o_ybin") == yb) & (F.col("o_band") == bd))
            .drop("o_band")
            .coalesce(1),
            root,
            f"cell-{yb}-{bd}",
            stats_cols=["o_ybin", "o_totalprice"],
        )
    binned.unpersist()
    return len(cells)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "zonemap-multi-smoke",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    print(
        f"# multi-column zone-map pruning smoke, base={sf_dir}, "
        f"pred: ybin in [{Y_LO},{Y_HI}] AND totalprice in [{P_LO:.0f},{P_HI:.0f}]"
    )
    print(
        "| rep | files_total | scanned 2-col | scanned part-only | "
        "scanned fraction 2-col | rows equal |"
    )
    print("|---|---|---|---|---|---|")
    pred = (F.col("o_ybin").between(Y_LO, Y_HI)) & (
        F.col("o_totalprice").between(P_LO, P_HI)
    )
    for rep in (1, 4, 16):
        root = tempfile.mkdtemp(prefix=f"zm_multi_{rep}x_")
        try:
            build_table(spark, sf_dir, rep, root)
            both, total, scanned2 = read_table_pruned(
                spark,
                root,
                predicates={
                    "o_ybin": (Y_LO, Y_HI),
                    "o_totalprice": (P_LO, P_HI),
                },
            )
            _, _, scanned1 = read_table_pruned(
                spark, root, predicates={"o_ybin": (Y_LO, Y_HI)}
            )
            n_pruned = both.filter(pred).count()
            n_full = read_table(spark, root).filter(pred).count()
            print(
                f"| {rep}x | {total} | {scanned2} | {scanned1} "
                f"| {scanned2 / total:.3f} | "
                f"{'yes' if n_pruned == n_full else 'NO'} ({n_pruned:,}) |"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
