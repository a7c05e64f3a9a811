"""DataFrame-level graph algorithms on top of the fixpoint executors.

These are the library-API counterparts of the Datalog programs the
reference benchmarks (Experiments.scala:29-156: TC, Reach, SSSP, CC,
Triangle count) — usable directly on any (src, dst[, weight]) DataFrame
without writing Datalog text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datalog.fixpoint import FixpointConfig, fixpoint_monotonic, fixpoint_seminaive
from .joins import hint_static


def _edges(df: DataFrame, src: str, dst: str) -> DataFrame:
    return df.select(F.col(src).alias("c0"), F.col(dst).alias("c1"))


def transitive_closure(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    cfg: FixpointConfig | None = None,
) -> DataFrame:
    """Left-linear TC: tc(a,b) ← arc; tc(a,b) ← tc(a,c), arc(c,b)."""
    e = _edges(edges, src, dst)
    arc = hint_static(e.select(F.col("c0").alias("j0"), F.col("c1").alias("j1")))

    def step(all_dfs, delta_dfs):
        d = delta_dfs["tc"]
        return {
            "tc": d.join(arc, on=d["c1"] == arc["j0"]).select(
                d["c0"].alias("c0"), arc["j1"].alias("c1")
            )
        }

    res = fixpoint_seminaive({"tc": e}, step, cfg)
    return res["tc"].select(F.col("c0").alias(src), F.col("c1").alias(dst))


def reach(
    edges: DataFrame, start, src: str = "src", dst: str = "dst",
    cfg: FixpointConfig | None = None,
) -> DataFrame:
    """Vertices reachable from `start`."""
    e = _edges(edges, src, dst)
    arc = hint_static(e)
    seed = e.sparkSession.createDataFrame([(start,)], "c0: long").select(
        F.col("c0").cast(e.schema[0].dataType)
    )

    def step(all_dfs, delta_dfs):
        d = delta_dfs["reach"]
        return {
            "reach": d.join(arc, on=d["c0"] == arc["c0"]).select(
                arc["c1"].alias("c0")
            )
        }

    res = fixpoint_seminaive({"reach": seed}, step, cfg)
    return res["reach"].select(F.col("c0").alias("vertex"))


def sssp(
    edges: DataFrame, start, src: str = "src", dst: str = "dst",
    weight: str = "weight", cfg: FixpointConfig | None = None,
) -> DataFrame:
    """Single-source shortest paths via the mmin fixpoint
    (AggregatesInRecursionQuerySuite SSSP program)."""
    e = edges.select(
        F.col(src).alias("j0"), F.col(dst).alias("j1"), F.col(weight).alias("w")
    )
    arc = hint_static(e)
    seed = e.sparkSession.createDataFrame([(start, 0)], "c0: long, c1: long").select(
        F.col("c0").cast(e.schema[0].dataType),
        F.col("c1").cast(e.schema[2].dataType),
    )

    def step(all_df, delta_df):
        return delta_df.join(arc, on=delta_df["c0"] == arc["j0"]).select(
            arc["j1"].alias("c0"), (delta_df["c1"] + arc["w"]).alias("c1")
        )

    res = fixpoint_monotonic(seed, step, ["c0"], "c1", "mmin", cfg)
    return res.select(F.col("c0").alias("vertex"), F.col("c1").alias("distance"))


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    directed: bool = False, cfg: FixpointConfig | None = None,
) -> DataFrame:
    """Min-label propagation CC (cc3/cc2 program,
    AggregatesInRecursionQuerySuite.scala:80-95). Returns (vertex, component)
    where component = min vertex id in the component."""
    e = _edges(edges, src, dst)
    if not directed:
        e = e.union(e.select(F.col("c1").alias("c0"), F.col("c0").alias("c1")))
    arc = hint_static(e.select(F.col("c0").alias("j0"), F.col("c1").alias("j1")))
    seed = e.select(F.col("c0"), F.col("c0").alias("c1")).union(
        e.select(F.col("c1").alias("c0"), F.col("c1"))
    )

    def step(all_df, delta_df):
        return delta_df.join(arc, on=delta_df["c0"] == arc["j0"]).select(
            arc["j1"].alias("c0"), delta_df["c1"].alias("c1")
        )

    res = fixpoint_monotonic(seed, step, ["c0"], "c1", "mmin", cfg)
    return res.select(F.col("c0").alias("vertex"), F.col("c1").alias("component"))


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Count of directed triangles x<y<z with arcs x→y→z→x
    (TriangleQuerySuite program)."""
    e = _edges(edges, src, dst)
    e1 = e.select(F.col("c0").alias("x"), F.col("c1").alias("y")).where("x < y")
    e2 = e.select(F.col("c0").alias("y"), F.col("c1").alias("z")).where("y < z")
    e3 = e.select(F.col("c0").alias("z"), F.col("c1").alias("x"))
    tri = e1.join(e2, on="y").join(e3, on=["z", "x"])
    return tri.agg(F.count(F.lit(1)).alias("triangles"))


def same_generation(
    parent_child: DataFrame, parent: str = "parent", child: str = "child",
    cfg: FixpointConfig | None = None,
) -> DataFrame:
    """same_generation(x,y) — RecursiveQuerySuites.scala:131-145."""
    pc = parent_child.select(F.col(parent).alias("p"), F.col(child).alias("c"))
    pcb = hint_static(pc)
    seed = (
        pc.alias("l")
        .join(pcb.alias("r"), on=F.col("l.p") == F.col("r.p"))
        .where(F.col("l.c") != F.col("r.c"))
        .select(F.col("l.c").alias("c0"), F.col("r.c").alias("c1"))
    )

    # sg(X,Y) <- pc(A,X), sg(A,B), pc(B,Y)
    def step(all_dfs, delta_dfs):
        d = delta_dfs["sg"]
        up = pcb.select(F.col("p").alias("pa"), F.col("c").alias("ca"))
        down = pcb.select(F.col("p").alias("pb"), F.col("c").alias("cb"))
        return {
            "sg": d.join(up, on=d["c0"] == up["pa"])
            .join(down, on=d["c1"] == down["pb"])
            .select(up["ca"].alias("c0"), down["cb"].alias("c1"))
        }

    res = fixpoint_seminaive({"sg": seed}, step, cfg)
    return res["sg"].select(F.col("c0").alias("x"), F.col("c1").alias("y"))
