"""Multi-executor validation on a REAL standalone cluster.

Every number in SCALING.md is one local[32] JVM; the claims that could
break when the driver and executors are separate processes are:

  1. the broadcast kernel family — the collected numpy lookups must
     survive cloudpickle + TorrentBroadcast to executor Python workers
     and produce values identical to the join formulations;
  2. ``localCheckpoint`` in the connected-components loop — lineage
     truncation must hold across processes (blocks live on executors);
  3. dynamic partition pruning on the persisted IVF index — the probe
     must still prune posting-list partitions when the filter is
     evaluated driver-side and the scan executor-side;
  4. plan shapes (Exchange budgets) — AQE on a real master must not
     re-introduce shuffles the local plans don't have.

Run (after starting a master + workers, see SCALING.md §18):

    SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 \
        python tools/standalone_cluster_check.py [sf_dir]

Prints one PASS/FAIL line per check and a summary; exit 0 = all pass.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bioframe_spark as bf  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402

RESULTS: list[tuple[str, bool, str]] = []


def check(name: str, ok: bool, note: str = ""):
    RESULTS.append((name, bool(ok), note))
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {note}", flush=True)


def canon(df):
    key = lambda t: tuple((v is None, str(type(v)), v) for v in t)
    cols = sorted(df.columns)
    return sorted([tuple(r[c] for c in cols) for r in df.collect()], key=key)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = os.environ.get("SPARK_GRAFT_MASTER", "")
    if not master.startswith("spark://"):
        print("set SPARK_GRAFT_MASTER=spark://host:port first", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("standalone-check", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # force one job so executors register, then count block managers
    # (minus the driver's)
    spark.range(1000).repartition(30).count()
    n_exec = (spark.sparkContext._jsc.sc()
              .getExecutorMemoryStatus().size() - 1)
    check("cluster.executors>=2", n_exec >= 2, f"{n_exec} executors")

    a = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")
    b = em.ivals_b(spark, sf_dir).select("chrom", "start", "end")
    s = em.ivals_s(spark, sf_dir)
    p = em.ivals_p(spark, sf_dir)

    # 1. broadcast kernels vs join formulations, cross-process
    k_cov = canon(bf.coverage(a, s.select("chrom", "start", "end")))
    j_cov = canon(bf.coverage(a, s.select("chrom", "start", "end"),
                              strategy="binned"))
    check("kernel.coverage==join", k_cov == j_cov, f"{len(k_cov)} rows")

    k_cnt = canon(bf.count_overlaps(a, s.select("chrom", "start", "end")))
    j_cnt = canon(bf.count_overlaps(a, s.select("chrom", "start", "end"),
                                    strategy="binned"))
    check("kernel.count_overlaps==join", k_cnt == j_cnt, f"{len(k_cnt)} rows")

    k_cl = canon(bf.closest(p, s, suffixes=("", "_s"), strategy="broadcast"))
    c_cl = canon(bf.closest(p, s, suffixes=("", "_s"), strategy="cogroup"))
    check("kernel.closest==cogroup", k_cl == c_cl, f"{len(k_cl)} rows")

    pm = canon(bf.cluster(a, premerge=True))
    cl = canon(bf.cluster(a, premerge=False, range_width=None))
    check("cluster.premerge==classic", pm == cl, f"{len(pm)} rows")

    # 2. localCheckpoint lineage truncation (connected components)
    from bioframe_spark.datapipe import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs)
    comp = dedup.connected_components(pairs)
    n_comp = comp.count()
    # re-count: the checkpointed frame must be stable and re-consumable
    check("localCheckpoint.components", n_comp == comp.count(),
          f"{n_comp} rows")

    # 3. IVF index: DPP across processes + value parity with brute force
    from bioframe_spark.datapipe import similarity as sim
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    loc = tempfile.mkdtemp(prefix="cluster_ivf_")
    sim.build_ivf_index(emb, f"{loc}/ivf", n_centroids=8, train_iters=2)
    q = emb.filter(F.col("vec_id") < 5)
    probe = sim.ivf_topk_indexed(q, f"{loc}/ivf", k=5, n_probe=8)
    # n_probe = n_centroids => identical to exact search over the corpus
    brute = sim.cosine_topk(q, emb, k=5)
    pv = {(r["query_id"], r["neighbor_id"]) for r in probe.collect()}
    bv = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    check("ivf.full-probe==brute", pv == bv, f"{len(pv)} pairs")
    plan = sim.ivf_topk_indexed(
        q, f"{loc}/ivf", k=5, n_probe=2
    )._jdf.queryExecution().executedPlan().toString()
    check("ivf.dpp-in-plan",
          "dynamicpruning" in plan.lower() or "DynamicPruning" in plan,
          "probe plan mentions dynamic pruning")

    # 4. plan budgets: kernel map-only shape survives a real master
    ap = f"{loc}/a_parquet"
    a.write.parquet(ap)
    a_scan = spark.read.parquet(ap)
    kern_plan = bf.coverage(
        a_scan, s.select("chrom", "start", "end")
    )._jdf.queryExecution().executedPlan().toString()
    n_ex = kern_plan.count("Exchange")
    n_rr = kern_plan.count("RoundRobinPartitioning")
    check("kernel.zero-key-exchanges", n_ex == n_rr,
          f"{n_ex} exchanges, {n_rr} round-robin")

    # 5. one ladder rung per family: absolute numbers are for the
    # SCALING.md addendum (3 executor JVMs on one box != 1 local JVM;
    # the check is that nothing degenerates, not a speedup claim)
    for name, thunk in {
        "coverage(kernel)": lambda: bf.coverage(
            a, s.select("chrom", "start", "end")),
        "overlap(binned)": lambda: bf.overlap(
            a, b, how="inner", strategy="binned", suffixes=("", "_b")),
        "merge(premerge)": lambda: bf.merge(a, premerge=True),
        "cluster(premerge)": lambda: bf.cluster(a, premerge=True),
        "closest(auto)": lambda: bf.closest(
            b, a, suffixes=("", "_x")),
    }.items():
        ts = []
        for _ in range(3):
            t0 = time.time()
            n = force_count(thunk())
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        print(f"TIME  {name}: median {med:.2f}s ({n} rows)", flush=True)

    n_fail = sum(1 for _, ok, _ in RESULTS if not ok)
    print(f"\n{len(RESULTS) - n_fail}/{len(RESULTS)} checks passed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
