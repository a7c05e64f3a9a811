"""CLI mirror of the reference benchmark driver
(examples/.../datalog/Experiments.scala:29-313): the same program numbers,
the same Datalog rules, running on this engine.

Usage:
  python examples/experiments.py --program=11 --file=graph.csv
  python examples/experiments.py --program=32 --file=weighted.csv --startvertex=0
  python examples/experiments.py --program=99 --file=prog.deal \
      --queryform='prg(A)' --baserelation_arc=arc.csv

Programs: 11 TC-LL | 12 TC-RL | 13 TC-NL | 21 SG | 31 APSP | 32 SSSP |
41 CC | 51 Reach | 71 Triangle count | 72 PYMK triangle closing |
73 PYMK + join & sort | 99 ad-hoc .deal file
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bigdatalog_spark import BigDatalogContext, build_session

ARC2 = "database({arc(From: integer, To: integer)})."
ARC3 = "database({arc(From: integer, To: integer, Cost: integer)})."


def tc_rules(kind: str) -> str:
    return {
        "RL": "tc(A,B) <- arc(A,B). tc(A,B) <- arc(A,C), tc(C,B).",
        "NL": "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), tc(C,B).",
        "LL": "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B).",
    }[kind]


def programs(opts):
    sv = opts.get("startvertex", "0")
    return {
        11: (ARC2, tc_rules("LL"), "tc(A,B).", ["arc"]),
        12: (ARC2, tc_rules("RL"), "tc(A,B).", ["arc"]),
        13: (ARC2, tc_rules("NL"), "tc(A,B).", ["arc"]),
        21: (
            "database({parent_child(Parent: integer, Child: integer)}).",
            "same_generation(X,Y) <- parent_child(Parent,X), parent_child(Parent,Y), X ~= Y."
            "same_generation(X,Y) <- parent_child(A,X), same_generation(A,B), parent_child(B,Y).",
            "same_generation(A,B).",
            ["parent_child"],
        ),
        31: (
            ARC3,
            "leftLinearSP(A,B,min<C>) <- mminleftLinearSP(A,B,C)."
            "mminleftLinearSP(A,B,mmin<C>) <- arc(A,B,C)."
            "mminleftLinearSP(A,B,mmin<D>) <- mminleftLinearSP(A,C,D1), arc(C,B,D2), D=D1+D2.",
            "leftLinearSP(A,B,C).",
            ["arc"],
        ),
        32: (
            ARC3,
            "leftLinearSP(B,min<C>) <- mminleftLinearSP(B,C)."
            f"mminleftLinearSP(B,mmin<C>) <- B={sv}, C=0."
            "mminleftLinearSP(B,mmin<D>) <- mminleftLinearSP(C,D1), arc(C,B,D2), D=D1+D2.",
            "leftLinearSP(A,B).",
            ["arc"],
        ),
        41: (
            ARC2,
            "cc3(X,mmin<X>) <- arc(X,_)."
            "cc3(Y,mmin<V>) <- cc3(X,V), arc(X,Y)."
            "cc2(X,min<Y>) <- cc3(X,Y)."
            "cc(countd<X>) <- cc2(_,X).",
            "cc(A).",
            ["arc"],
        ),
        51: (
            ARC2,
            f"reach(B) <- B={sv}." "reach(B) <- reach(A), arc(A,B).",
            "reach(A).",
            ["arc"],
        ),
        71: (
            ARC2,
            "triangles(X,Y,Z) <- arc(X,Y), X < Y, arc(Y,Z), Y < Z, arc(Z,X)."
            "triangle_count(count<_>) <- triangles(X,Y,Z).",
            "triangle_count(A).",
            ["arc"],
        ),
        72: (
            ARC2,
            "uarc(X, Y) <- arc(X, Y)."
            "uarc(Y, X) <- arc(X, Y)."
            "triangle_closing(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z).",
            "triangle_closing(A,B,C).",
            ["arc"],
        ),
        73: (
            ARC2[:-2] + ", pages(X: integer, W2: integer, W3: integer, W4: integer,"
            " W5: integer, W6: integer, W7: integer, W8: integer, W9: integer)}).",
            "uarc(X, Y) <- arc(X, Y)."
            "uarc(Y, X) <- arc(X, Y)."
            "triangle_closing(Y, Z, count<X>) <- uarc(X,Y), uarc(X,Z), Y ~= Z, ~uarc(Y,Z)."
            f"result(X, W9) <- triangle_closing(X, {opts.get('vertex', '0')}, Z),"
            " pages(X, W2, W3, W4, W5, W6, W7, W8, W9), sort((Z, asc)).",
            "result(A,B).",
            ["arc", "pages"],
        ),
    }


def main():
    opts = dict(
        a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a
    )
    pid = int(opts["program"])
    spark = build_session(app_name=f"experiments-{pid}")
    spark.sparkContext.setLogLevel("ERROR")
    ctx = BigDatalogContext(spark)
    t0 = time.time()

    if pid == 99:
        ctx.load_file(opts["file"])
        for k, v in opts.items():
            if k.startswith("baserelation_"):
                ctx.register_file(k.split("_", 1)[1], v)
        result = ctx.query(
            opts["queryform"] + ("" if opts["queryform"].endswith(".") else ".")
        )
    else:
        database, rules, goal, rels = programs(opts)[pid]
        ctx.load_program(database + rules)
        files = [opts["file"]] + ([opts["pagesfile"]] if len(rels) > 1 else [])
        for name, path in zip(rels, files):
            ctx.register_file(name, path)
        result = ctx.query(goal)

    n = result.count()
    ms = int((time.time() - t0) * 1000)
    print(f"execution time: {ms} ms, result size: {n}")


if __name__ == "__main__":
    main()
