"""Physical-plan quality gates — the scale posture, enforced.

Correctness says the operator computes the right answer; these tests
say it computes it with the PLAN you'd want on a 1000-executor
cluster: filters pushed to the parquet scan, read schemas pruned to
the referenced columns, small dimensions broadcast, top-k planned as
TakeOrderedAndProject (never a full sort), and partitioned reads
pruned by partition filters. A regression here is a 100 TB incident
that no row-count check would catch.
"""

from __future__ import annotations

import pytest

from voter_file_etl_spark import registry

registry.load_all()


def _formatted_plan(spark, key: str, sf_dir: str) -> str:
    df = registry.QUERIES[key](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _formatted_plan(spark, "a4_groupby_count", sf_dir)
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed to parquet"


def test_scan_schema_is_pruned(spark, sf_dir):
    plan = _formatted_plan(spark, "a4_groupby_count", sf_dir)
    # lineitem has 11 columns; the query touches 7. The scan must not
    # read the join keys it doesn't use.
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read, read


def test_small_dim_join_broadcasts(spark, sf_dir):
    plan = _formatted_plan(spark, "j1_inner_join", sf_dir)
    assert "BroadcastHashJoin" in plan, "dim join did not broadcast"


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _formatted_plan(spark, "sql1_topk_revenue", sf_dir)
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT planned as full sort"
    assert "EqualTo(c_mktsegment,BUILDING)" in plan, "segment filter not pushed"


def test_partition_pruning_after_partitioned_write(spark, sf_dir):
    plan = _formatted_plan(spark, "l3_partition_pruning", sf_dir)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan or (
        "PartitionFilters" in plan and "l_returnflag" in plan
    ), "partition filter did not prune the partitioned read"


def test_anti_join_is_join_not_subquery_loop(spark, sf_dir):
    plan = _formatted_plan(spark, "p6_anti_join", sf_dir)
    assert "LeftAnti" in plan, "anti-join shape lost"


def test_multi_distinct_has_no_expand(spark, sf_dir):
    # agg(countDistinct x3) would plan an Expand that multiplies every
    # input row by 3 before the shuffle; a6 is written as joined
    # single-distinct aggregates precisely to avoid that.
    plan = _formatted_plan(spark, "a6_multi_distinct", sf_dir)
    assert "Expand" not in plan, "a6 reintroduced the multi-distinct Expand blowup"
    assert plan.count("HashAggregate") >= 6, "per-column dedup aggregates missing"


@pytest.mark.parametrize(
    "key",
    ["a4_groupby_count", "j4_large_join", "a5_household_agg", "st1_tumbling_window"],
)
def test_aggregates_are_partial_final(spark, sf_dir, key):
    # Partial (map-side) aggregation before the exchange: the plan
    # must contain two HashAggregate nodes around the shuffle.
    plan = _formatted_plan(spark, key, sf_dir)
    assert plan.count("HashAggregate") >= 2, f"{key}: no map-side partial aggregate"


def test_bucketed_join_key_has_no_shuffle(spark, sf_dir):
    # j9 writes both sides bucketed by the join key; the join itself
    # must then plan with no Exchange above either scan — the bucket
    # layout IS the shuffle, paid once at write time.
    plan = _formatted_plan(spark, "j9_bucketed_join", sf_dir)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # Exactly one Exchange is allowed: the final aggregation's. The
    # join inputs must come straight from the bucketed scans. (Count
    # tree nodes — formatted mode puts hashpartitioning arguments on
    # a separate line, so substring-matching "Exchange hashpartitioning"
    # would be vacuously zero.)
    assert plan.count("+- Exchange") <= 1, plan[:2000]


def test_spatial_join_is_equi_join_not_cartesian(spark, sf_dir):
    # j10's proximity predicate must plan as an equi-join on the cell
    # keys (blocking), never a CartesianProduct / BroadcastNestedLoop
    # with a theta filter.
    plan = _formatted_plan(spark, "j10_spatial_blocked_join", sf_dir)
    assert "CartesianProduct" not in plan, "spatial join fell back to cartesian"
    assert "BroadcastNestedLoopJoin" not in plan, "spatial join is a nested loop"


def test_schema_evolution_read_prunes_columns(spark, sf_dir):
    # The mergeSchema read must still prune: the aggregate touches
    # only 3 of the union-schema columns.
    plan = _formatted_plan(spark, "l5_schema_evolution", sf_dir)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "o_orderkey" not in read[-1], read


def test_semdedup_assignment_is_map_side(spark, sf_dir):
    # x26's cell assignment is a broadcast-codebook mapInPandas: the
    # stage between scan and the pair-search shuffle must contain no
    # join for the assignment itself.
    plan = _formatted_plan(spark, "x26_semdedup", sf_dir)
    assert "CartesianProduct" not in plan


def test_spatial_expansion_is_bounded_9x(spark, sf_dir):
    # j10's neighborhood expansion must be the two 3-element explodes
    # (3x3 = bounded 9x on ONE side) — not an unbounded generator and
    # not an expansion of both sides.
    plan = _formatted_plan(spark, "j10_spatial_blocked_join", sf_dir)
    assert plan.count("+- Generate") == 2, plan[:2000]


def test_semdedup_components_iteration_is_bounded(spark):
    # x26's connected-components loop must be driver-bounded: a hard
    # max_iter with early exit, never an unbounded fixpoint.
    import inspect

    from voter_file_etl_spark.operators.graph import connected_components

    sig = inspect.signature(connected_components)
    assert sig.parameters["max_iter"].default <= 20


def test_components_converge_early_on_chain(spark):
    # 0-1-2-3 chain + isolated pair: min-label propagation must
    # produce the right components well inside the iteration cap.
    from voter_file_etl_spark.operators.graph import connected_components

    und = [(0, 1), (1, 2), (2, 3), (10, 11)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (10, 10), (11, 10)}


def test_kmeans_centroid_join_is_broadcast(spark, sf_dir):
    # x30's assignment step joins every vector against the K=16
    # centroid table: that join must be a broadcast (nested-loop over
    # a 16-row broadcast side is the intended bounded shape), never a
    # shuffle-partitioned cartesian.
    plan = _formatted_plan(spark, "x30_kmeans_codebook", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Broadcast" in plan, plan[:2000]


def test_range_frame_window_has_single_shuffle(spark, sf_dir):
    # w8's RANGE frame must plan as ONE exchange on user_id followed
    # by sort + window — a second exchange would mean the frame was
    # recomputed per aggregate instead of shared.
    plan = _formatted_plan(spark, "w8_time_range_frame", sf_dir)
    assert plan.count("+- Exchange") == 1, plan[:2000]
    assert "Window" in plan


def test_histogram_spine_join_is_broadcast(spark, sf_dir):
    # a18's empty-bin densification joins a tiny generated spine to
    # the counts — that join must broadcast, never shuffle both sides.
    plan = _formatted_plan(spark, "a18_histogram", sf_dir)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:2000]


def test_pagerank_iterations_have_no_cartesian(spark, sf_dir):
    # g1's three unrolled iterations are equi-joins on node ids; a
    # cartesian anywhere means an iteration lost its join key.
    plan = _formatted_plan(spark, "g1_pagerank", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_nearest_event_join_is_windows_not_join(spark, sf_dir):
    # j11 must be the two-running-windows formulation — a pairwise
    # |Δt| join (SortMergeJoin/ShuffledHashJoin between event sets)
    # would be quadratic per user.
    plan = _formatted_plan(spark, "j11_nearest_event_join", sf_dir)
    assert "Window" in plan
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, f"unexpected {node} in j11 plan"


def test_full_outer_join_is_sort_merge(spark, sf_dir):
    # j12: full-outer cannot broadcast (both sides keep unmatched
    # rows); the right plan is a sort-merge join with both sides
    # hash-partitioned on the key — never a nested loop.
    plan = _formatted_plan(spark, "j12_full_outer_join", sf_dir)
    assert "SortMergeJoin FullOuter" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_is_map_side_only(spark, sf_dir):
    # x42 is pure per-row array arithmetic: any Exchange means the
    # chunker started shuffling document text.
    plan = _formatted_plan(spark, "x42_doc_chunking", sf_dir)
    assert "+- Exchange" not in plan, plan[:2000]


def test_hash_encode_is_map_side_only(spark, sf_dir):
    # t12: hash/encode intrinsics are one codegen stage, no shuffle.
    plan = _formatted_plan(spark, "t12_hash_encode", sf_dir)
    assert "+- Exchange" not in plan, plan[:2000]
    assert "[codegen id : 1]" in plan  # single whole-stage-codegen span


def test_substring_dedup_is_equi_join(spark, sf_dir):
    # x41's pair discovery must be the shingle equi-join (blocked by
    # content), never an all-pairs nested loop over documents.
    plan = _formatted_plan(spark, "x41_substring_dedup", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_pmi_vocab_join_is_broadcast(spark, sf_dir):
    # x43: the top-100 vocabulary must broadcast to the token stream
    # (a shuffle of all tokens against 100 rows would be absurd); the
    # only nested-loop allowed is the 1-row corpus-size factor.
    plan = _formatted_plan(spark, "x43_pmi_cooccurrence", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_funnel_steps_are_equi_joins(spark, sf_dir):
    # a22's funnel is keyed on user_id: one user-partitioned
    # aggregate collects per-step times and the strict chain is
    # map-side (r13 — no per-step joins at all); a nested loop
    # anywhere means the chain lost its key.
    plan = _formatted_plan(spark, "a22_funnel", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "hashpartitioning(user_id" in plan


def test_retention_and_islands_never_single_partition(spark, sf_dir):
    # a23/w10 shuffle only on user_id / rollup keys — a
    # SinglePartition exchange would mean a global sort or global
    # window crept in (the 100 TB funnel-killer).
    for key in ("a23_retention_cohorts", "w10_gaps_islands"):
        plan = _formatted_plan(spark, key, sf_dir)
        assert "SinglePartition" not in plan, (key, plan[:2000])
        assert "CartesianProduct" not in plan, key


def test_line_dedup_windows_are_partitioned(spark, sf_dir):
    # x44's winner filter partitions by the line text and the
    # reassembly by doc_id — both real keys, no global window, no
    # cartesian.
    plan = _formatted_plan(spark, "x44_line_dedup", sf_dir)
    assert "SinglePartition" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(line" in plan


def test_change_feed_is_equi_outer_join(spark, sf_dir):
    # l11's per-commit diff joins adds vs removes on the upsert key —
    # a full outer SMJ over only the touched buckets, never a
    # nested loop.
    plan = _formatted_plan(spark, "l11_change_feed", sf_dir)
    assert "FullOuter" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lateral_topn_decorrelates_to_window(spark, sf_dir):
    # sql8's LATERAL (ORDER BY ... LIMIT 2) must decorrelate into a
    # ranked window with WindowGroupLimit pushdown — a per-outer-row
    # re-scan of customer (nested-loop shape) would be quadratic.
    plan = _formatted_plan(spark, "sql8_lateral_topn", sf_dir)
    assert "Window" in plan and "WindowGroupLimit" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_skew_profile_is_top_k(spark, sf_dir):
    # a27's heavy-key head must plan TakeOrderedAndProject (per-
    # partition top-10 + driver merge), never a full sort of the
    # per-key counts.
    plan = _formatted_plan(spark, "a27_key_skew_profile", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_bfs_frontier_joins_are_equi(spark, sf_dir):
    # g3's six frontier expansions are equi-joins on node id; the
    # only nested-loop join allowed is the bounded 1-row count
    # broadcast that parameterizes the edge formulas.
    plan = _formatted_plan(spark, "g3_bfs_levels", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_durable_checkpoint_knob(spark, sf_dir, tmp_path, monkeypatch):
    # $SPARK_GRAFT_CHECKPOINT_DIR switches iter_checkpoint from
    # executor-local localCheckpoint to durable reliable checkpoint()
    # (VERDICT r3 #5). The toggled run must produce the identical BFS
    # answer, actually write checkpoint data under the dir, and leave
    # the downstream plan shape unchanged (scan of materialized rows —
    # no cartesian, same equi-join discipline).
    import os

    from voter_file_etl_spark.session import CHECKPOINT_DIR_ENV

    baseline = {
        (r["node"], r["hops"])
        for r in registry.QUERIES["g3_bfs_levels"](spark, sf_dir).collect()
    }
    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, str(ckpt))
    durable = {
        (r["node"], r["hops"])
        for r in registry.QUERIES["g3_bfs_levels"](spark, sf_dir).collect()
    }
    assert durable == baseline
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "durable mode wrote nothing under the checkpoint dir"
    plan = _formatted_plan(spark, "g3_bfs_levels", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_reservoir_sample_is_take_ordered(spark, sf_dir):
    # x54's exactly-k-by-hash-rank must plan TakeOrderedAndProject
    # (per-partition local k + driver merge of partitions*k rows) —
    # a global Sort before the limit would shuffle the whole corpus.
    plan = _formatted_plan(spark, "x54_reservoir_sample", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Exchange rangepartitioning" not in plan, plan[:2000]


def test_knn_join_is_blocked_equi(spark, sf_dir):
    # j17's candidate generation must be the bounded 9x grid-cell
    # equi-join (same blocking as j10), ranked by a per-probe window —
    # never a cartesian distance join.
    plan = _formatted_plan(spark, "j17_knn_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Window" in plan, plan[:2000]


def test_embedding_outlier_centroids_broadcast(spark, sf_dir):
    # x55 joins the O(labels) centroid table back to the corpus — that
    # side must broadcast; re-shuffling the corpus for a 10-row dim
    # would be the 100 TB mistake.
    plan = _formatted_plan(spark, "x55_embedding_outlier", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_targeted_salt_profile_is_broadcast(spark, sf_dir):
    # j18's hot-key set must reach both join sides as a broadcast
    # (it's O(heavy keys)); the final fact-dim join stays an equi-join
    # on (key, salt) — no cartesian anywhere.
    plan = _formatted_plan(spark, "j18_skew_salted_join", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_ngram_novelty_is_single_pass_mark_join(spark, sf_dir):
    # x56's vocabulary check is ONE LeftOuter mark-join on the hashed
    # shingle (8-byte keys), aggregated in the same pass — never a
    # cartesian containment scan, and never the old two-pass
    # anti-join + recount shape (round-4 perf pass, SCALE.md).
    plan = _formatted_plan(spark, "x56_ngram_novelty", sf_dir)
    assert "LeftOuter" in plan, plan[:2000]
    assert "xxhash64" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # one join total (formatted mode prints each node twice — tree
    # line + detail block — so count the detail headers)
    assert plan.count("Join type:") == 1, plan[:2000]


def test_phash_near_dup_is_hamming_ball_delta_join(spark, sf_dir):
    # m14's candidates come from the exact Hamming-ball delta-join:
    # the 2,324-row XOR-mask table is broadcast (the only acceptable
    # "cross" is the bounded BroadcastNestedLoopJoin against it —
    # never a CartesianProduct of data against data), and partner
    # existence is an equi-join on p2 — broadcast-hinted only while
    # the distinct-hash bound is under _M14_BROADCAST_MAX_HASHES
    # (ADVICE r7 #3: a forced hint would OOM the driver on a
    # high-distinct-hash corpus instead of degrading to the
    # still-linear shuffle join). This is linear in distinct hashes
    # and skew-immune where band-bucket saturation was quadratic
    # (r7 sf1.0 probe: 66M banded candidate pairs vs ~2.3k
    # masks/hash here).
    from voter_file_etl_spark.operators import multimodal as mm

    plan = _formatted_plan(spark, "m14_phash_near_dup", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "delta" in plan, plan[:2000]
    # At every test/bench scale the gate holds, so the hint must be
    # present (the assertion is conditional on the same predicate the
    # implementation uses — if the gate flips, the plan may
    # legitimately shuffle-join).
    if mm._m14_use_broadcast(10 * 50_000):  # 10x the sf1.0 probe corpus
        assert "BroadcastHashJoin" in plan, plan[:2000]
    # Gate behavior at the boundaries: small corpora broadcast, a
    # corpus whose distinct-hash bound saturates past the cap does not.
    assert mm._m14_use_broadcast(1_000_000)
    assert not mm._m14_use_broadcast(20_000_000)  # bound saturates at 2^24


def test_dedup_clusters_is_one_blk_window_no_edge_join(spark, sf_dir):
    # x17's edge relation (same blocking hash) is an equivalence
    # relation, so components == blk groups: the plan must be ONE
    # blk-partitioned window over the keyed docs — never the blk
    # self-join that materializes O(sum block_size^2) clique edges
    # and iterates label propagation (the m14 defect class; the r8
    # dup-skew probe measured a 10%-duplicate corpus at 15.58 s in
    # the join form vs 0.58 s — duplication-flat — here).
    plan = _formatted_plan(spark, "x17_dedup_clusters", sf_dir)
    assert "Window" in plan, plan[:2000]
    # The formatted Window node prints its functions as
    # windowspecdefinition(<partition cols>, <frame>): asserting the
    # partition column INSIDE that spelling is what actually gates the
    # blk-partitioned window (a bare "blk" substring is vacuously true
    # via the projection alias — ADVICE r8 #4).
    assert "windowspecdefinition(blk#" in plan, plan[:2000]
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, f"{join} in x17 plan:\n{plan[:2000]}"


def test_incremental_dedup_window_is_batch_side(spark, sf_dir):
    # x46 arbitrates within the incoming batch via a keyed window and
    # joins the corpus on the dedup key — no cartesian, and the
    # corpus side must reduce to distinct keys before the join.
    plan = _formatted_plan(spark, "x46_incremental_dedup", sf_dir)
    assert "Window" in plan and "CartesianProduct" not in plan, plan[:2000]


def test_band_join_is_equi_on_buckets(spark, sf_dir):
    # j13's +-band predicate must plan as an equi-join on the price
    # buckets (3x bounded explode on the probe side), never a
    # cartesian/nested-loop theta join of part with itself.
    plan = _formatted_plan(spark, "j13_band_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert plan.count("+- Generate") == 1, plan[:2000]


def test_resample_spine_is_executor_side(spark, sf_dir):
    # w11's day spine comes from sequence()+explode inside the plan
    # (Generate), never a driver-built range; the fill is window
    # functions, not a self-join.
    plan = _formatted_plan(spark, "w11_resample_ffill", sf_dir)
    assert "Generate" in plan and "Window" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_embedding_quantize_is_map_side_only(spark, sf_dir):
    # x47 is pure per-row array lambdas: no exchange, no join, no
    # UDF — one scan-project stage.
    plan = _formatted_plan(spark, "x47_embedding_quantize", sf_dir)
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan and "pythonUDF" not in plan.lower(), plan[:2000]


def test_attribution_touches_share_one_window(spark, sf_dir):
    # a29's first-touch and last-touch must evaluate in the same
    # window exchange (one sort over (user, time)), not two.
    plan = _formatted_plan(spark, "a29_attribution", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("+- Window") <= 2, plan[:2000]


def test_scd2_pit_join_is_equi_with_residual(spark, sf_dir):
    # j15's interval condition must ride as a residual on a custkey
    # equi hash/merge join — never a nested loop over intervals.
    plan = _formatted_plan(spark, "j15_scd2_pit_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_null_safe_join_stays_equi(spark, sf_dir):
    # j14's <=> must plan as a hash join on (coalesce, isnull)
    # composite keys, not a nested loop.
    plan = _formatted_plan(spark, "j14_null_safe_join", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_span_corruption_is_map_side(spark, sf_dir):
    # x50 is one scan-project of array lambdas: no exchange, no UDF.
    plan = _formatted_plan(spark, "x50_span_corruption", sf_dir)
    assert "Exchange" not in plan, plan[:2000]
    assert "pythonUDF" not in plan.lower(), plan[:2000]


def test_interval_overlap_join_is_equi_on_months(spark, sf_dir):
    # j16's intersection predicate must ride on a month-grid
    # equi-join, never a nested-loop over the interval sets.
    plan = _formatted_plan(spark, "j16_interval_overlap_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_edit_distance_join_is_deletion_key_equi(spark, sf_dir):
    # j19's FastSS reduction must plan the pair generation as an
    # equi-join on the deletion key — a BroadcastNestedLoop or
    # CartesianProduct would mean the O(V^2) levenshtein scan the
    # reduction exists to eliminate.
    plan = _formatted_plan(spark, "j19_edit_distance_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_record_linkage_is_blocked_equi(spark, sf_dir):
    # d4's candidate generation must stay the (nationkey, prefix)
    # blocked equi-join; levenshtein may appear only as a post-join
    # projection, never as a join condition driving a nested loop.
    plan = _formatted_plan(spark, "d4_record_linkage", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_ks_cdf_has_no_global_raw_window(spark, sf_dir):
    # a36's CDF is the two-level prefix sum: the only unpartitioned
    # window runs over the O(buckets) table. If a global window ran
    # over raw distinct values, the plan would show a Window whose
    # required ordering is on 'v' with an Exchange SinglePartition
    # directly feeding it from the un-bucketed aggregate. Cheap proxy:
    # the plan must contain a PARTITIONED window (partition spec bkt).
    plan = _formatted_plan(spark, "a36_ks_two_sample", sf_dir)
    assert "bkt" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_winsorize_quantiles_broadcast(spark, sf_dir):
    # x60 joins the O(langs) percentile table back onto the corpus —
    # that side must broadcast (re-shuffling the corpus against a
    # handful of rows is the 100 TB mistake).
    plan = _formatted_plan(spark, "x60_winsorize", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_qualify_topn_window_is_partitioned(spark, sf_dir):
    # sql10's rank must be computed per-customer (hash partition on
    # o_custkey), never as a single global sort.
    plan = _formatted_plan(spark, "sql10_qualify_topn", sf_dir)
    assert "hashpartitioning(o_custkey" in plan, plan[:2000]


def test_shard_balance_total_is_broadcast(spark, sf_dir):
    # x61's grand total must ride along as a broadcast 1-row
    # aggregate (in-plan scalar discipline, same as a33/a34).
    plan = _formatted_plan(spark, "x61_shard_balance", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]


def test_chi_square_marginals_broadcast(spark, sf_dir):
    # a37's row/col marginal joins and the N scalar must all be
    # broadcasts onto the O(cells) table — no shuffle after the
    # contingency aggregate.
    plan = _formatted_plan(spark, "a37_chi_square", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_lag_autocovariance_windows_on_daily(spark, sf_dir):
    # a38's lag windows must run over the O(days) aggregate — the
    # plan's Window node sits above a HashAggregate keyed on day,
    # never over raw orders.
    plan = _formatted_plan(spark, "a38_lag_autocovariance", sf_dir)
    assert "Window" in plan and "HashAggregate" in plan, plan[:2000]


def test_langid_confusion_row_totals_broadcast(spark, sf_dir):
    # x62 joins the O(langs) row-total table back onto the O(langs^2)
    # contingency — broadcast, not shuffle.
    plan = _formatted_plan(spark, "x62_langid_confusion", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_digest_filter_is_pushed(spark, sf_dir):
    # f8's 1-in-97 keyspace slice must reach the parquet scan as a
    # pushed filter on doc_id, and the read schema must carry only
    # doc_id + text.
    plan = _formatted_plan(spark, "f8_hash_digest_funcs", sf_dir)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read and "source" not in read, read


def test_nulls_ordering_plans_take_ordered(spark, sf_dir):
    # o5's LIMIT 40 must plan TakeOrderedAndProject with the explicit
    # NULLS FIRST comparator — never a global sort.
    plan = _formatted_plan(spark, "o5_nulls_ordering", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "NULLS FIRST" in plan, plan[:2000]


def test_star_denorm_dims_broadcast_fact_shuffles_once(spark, sf_dir):
    # j20's three dimension joins must ALL be broadcasts chained onto
    # the fact side; the only exchanges allowed are for the lineitem
    # rollup + fact-rollup join. The region predicate must prune
    # before the broadcast.
    plan = _formatted_plan(spark, "j20_star_denorm", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "EqualTo(r_name,ASIA)" in plan or "r_name" in plan, plan[:2000]


def test_drawdown_is_single_window_pass(spark, sf_dir):
    # w14's peak and drawdown must come from ONE customer-partitioned
    # window — no self-join, no second exchange.
    plan = _formatted_plan(spark, "w14_drawdown", sf_dir)
    # formatted explain prints each node twice (tree + detail): one
    # Window node => exactly one "(N) Window" detail header.
    assert plan.count(") Window") == 1, plan[:2000]
    assert plan.count(") Exchange") == 1, plan[:2000]
    assert "hashpartitioning(o_custkey" in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_bloom_bit_probes_are_broadcast(spark, sf_dir):
    # x63's two bit-membership probes must be broadcast joins (the
    # bit-set is <= 16384 rows); only the measurement harness's exact
    # truth join may shuffle.
    plan = _formatted_plan(spark, "x63_bloom_prefilter", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_token_shift_topk_is_take_ordered(spark, sf_dir):
    # x64's global top-50 must plan as TakeOrderedAndProject, never a
    # full sort of the token-count table.
    plan = _formatted_plan(spark, "x64_token_shift", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Sort [ratio_ppm" not in plan


def test_ewma_window_is_partitioned(spark, sf_dir):
    # w15's lag chain must run per-customer (one shuffle on
    # o_custkey), never as a global unpartitioned window.
    plan = _formatted_plan(spark, "w15_ewma", sf_dir)
    assert "hashpartitioning(o_custkey" in plan, plan[:2000]
    # exactly one window exchange: no per-lag re-shuffles
    assert plan.count("hashpartitioning(o_custkey") <= 2, plan[:2000]


def test_gini_rank_window_is_per_segment(spark, sf_dir):
    plan = _formatted_plan(spark, "a39_gini", sf_dir)
    assert "hashpartitioning(c_mktsegment" in plan, plan[:2000]


def test_conversion_lag_joins_on_user(spark, sf_dir):
    # a40: no cartesian anywhere; the purchase-side join is keyed on
    # user_id so AQE co-partitions it with the first-click aggregate.
    plan = _formatted_plan(spark, "a40_conversion_lag", sf_dir)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan, plan[:2000]


def test_url_parse_stays_map_side(spark, sf_dir):
    # f9: synthesis + parse_url are map-side expressions; the only
    # exchange is the bounded per-host rollup.
    plan = _formatted_plan(spark, "f9_url_parse", sf_dir)
    assert "ParseUrlEvaluator" in plan or "parse_url" in plan
    assert "Join" not in plan, plan[:2000]


def test_ols_trend_has_no_raw_window(spark, sf_dir):
    # a41 collapses to the daily series with plain aggregates; no
    # Window operator (and no join) should appear anywhere.
    plan = _formatted_plan(spark, "a41_ols_trend", sf_dir)
    assert "Window" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_json_nested_is_map_side(spark, sf_dir):
    # t16: synthesis + JSON extraction are projections, with ONE
    # from_json parse feeding every field (four get_json_object calls
    # would re-parse the payload four times — measured 2.7 s -> 1.3 s
    # at sf0.1); the only exchange is the bounded per-priority rollup.
    plan = _formatted_plan(spark, "t16_json_nested", sf_dir)
    assert "from_json" in plan, plan[:1500]
    assert "get_json_object" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:2000]


def test_golden_record_is_single_entity_shuffle(spark, sf_dir):
    # d5: field-wise survivorship must be ONE conditional aggregation
    # keyed on the entity (no per-field self-joins).
    plan = _formatted_plan(spark, "d5_golden_record", sf_dir)
    assert "Join" not in plan, plan[:2000]
    assert "hashpartitioning(c_custkey" in plan, plan[:2000]


def test_vocab_coverage_aggregates_before_window(spark, sf_dir):
    # x65's global window must run over the collapsed token-count
    # table (partial aggregation below the exchange), never raw rows.
    plan = _formatted_plan(spark, "x65_vocab_coverage", sf_dir)
    assert "partial_count" in plan, plan[:2000]


def test_pivot_syntax_lowers_to_aggregate(spark, sf_dir):
    # sql11's PIVOT clause must lower to the same partial/final
    # aggregate p8 plans — no Expand blowup, dim join broadcast.
    plan = _formatted_plan(spark, "sql11_pivot_syntax", sf_dir)
    assert "Expand" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_asof_tolerance_is_sort_not_join(spark, sf_dir):
    # j21 is the union+last_value formulation: one partitioned sort,
    # ZERO joins (the tolerance is a post-mask).
    plan = _formatted_plan(spark, "j21_asof_tolerance", sf_dir)
    assert "Join type:" not in plan, plan[:2000]
    assert "Window" in plan, plan[:2000]


def test_sketch_overlap_estimate_is_broadcast(spark, sf_dir):
    # a42's three-estimate table is a 1-row broadcast next to the
    # exact-truth intersect; the sketches themselves must aggregate
    # partial/final (map-side HLL state).
    plan = _formatted_plan(spark, "a42_sketch_overlap", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_hll_sketch_agg" in plan, plan[:2000]


def test_phonetic_key_rollup_follows_distinct(spark, sf_dir):
    # f10: the skeleton rollup must run on the distinct-vocab table
    # (bounded), with the token dedup aggregated partial/final below.
    plan = _formatted_plan(spark, "f10_phonetic_key", sf_dir)
    assert plan.count("HashAggregate") >= 4, plan[:2000]


def test_email_normalize_is_map_side_rollup(spark, sf_dir):
    # f11: canonicalization is pure string expressions — no join
    # anywhere; only the domain rollup (+ distinct-count phase)
    # exchanges.
    plan = _formatted_plan(spark, "f11_email_normalize", sf_dir)
    assert "Join type:" not in plan, plan[:2000]


def test_moving_slope_shares_one_exchange(spark, sf_dir):
    # w16: the row_number pass and the ROWS-frame sums must reuse ONE
    # shuffle on o_custkey — a second exchange between the two window
    # passes would double the shuffle volume for no reason.
    plan = _formatted_plan(spark, "w16_moving_slope", sf_dir)
    assert plan.count("Window") >= 2, plan[:2000]
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_shuffles == 1, plan[:2000]


def test_multiline_json_region_join_broadcasts(spark, sf_dir):
    plan = _formatted_plan(spark, "s18_multiline_json", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_common_neighbors_has_no_cartesian(spark, sf_dir):
    # g6: wedge enumeration and the adjacency screen are equi-joins
    # on edge keys — a nested loop here is quadratic in nodes.
    plan = _formatted_plan(spark, "g6_common_neighbors", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_channel_stats_shuffles_sums_not_pixels(spark, sf_dir):
    # m15: decode is Arrow map work; the exchange must carry the
    # per-image 3-sum rows through a partial/final aggregate, and
    # nothing may join.
    plan = _formatted_plan(spark, "m15_image_channel_stats", sf_dir)
    assert "MapInPandas" in plan, plan[:2000]
    assert "Join type:" not in plan, plan[:2000]
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_mixture_upsample_factors_broadcast(spark, sf_dir):
    # x68: the O(domains) factor table rides a broadcast join; the
    # replica explode is a map-side Generate — no shuffle of the
    # replicated rows before the final bounded rollup.
    plan = _formatted_plan(spark, "x68_mixture_upsample", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "Generate" in plan, plan[:2000]


def test_range_shards_is_one_sort_one_rollup(spark, sf_dir):
    # x69: the parity formulation is ntile over ONE global sort plus
    # a bounded rollup — any extra exchange means the assignment
    # re-shuffled the corpus.
    plan = _formatted_plan(spark, "x69_range_shards", sf_dir)
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_shuffles == 1, plan[:2000]
    assert "ntile(16)" in plan, plan[:2000]


def test_higher_order_lambdas_stay_map_side(spark, sf_dir):
    # t17: lambda evaluation is codegen expression work — no shuffle,
    # no Python, no join anywhere in the plan.
    plan = _formatted_plan(spark, "t17_higher_order_funcs", sf_dir)
    assert "Exchange" not in plan, plan[:2000]
    assert "Join type:" not in plan, plan[:2000]


def test_two_level_partition_pruning(spark, sf_dir):
    # s19: BOTH discovered partition columns must appear in the
    # scan's PartitionFilters — pruning to one leaf directory.
    plan = _formatted_plan(spark, "s19_partition_discovery", sf_dir)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan[:2000]
    assert "l_returnflag" in pf[0] and "l_linestatus" in pf[0], pf[0]


def test_pipe_syntax_compiles_to_same_plan_shape(spark, sf_dir):
    # sql13: the |> chain must produce the nested form's physical
    # plan — broadcast dim join, partial/final agg, top-k as
    # TakeOrderedAndProject (never a global sort).
    plan = _formatted_plan(spark, "sql13_pipe_syntax", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_variant_extract_is_map_side(spark, sf_dir):
    # t18: parse_json/variant_get are codegen expressions — no join,
    # one exchange for the bounded rollup.
    plan = _formatted_plan(spark, "t18_variant_extract", sf_dir)
    assert "Join type:" not in plan, plan[:2000]
    assert "variant_get" in plan, plan[:2000]


def test_parameterized_sql_pushes_bound_predicates(spark, sf_dir):
    # sql14: named-parameter binding happens at parse time, so the
    # scan must show the bound segment filter pushed down exactly
    # like an inline literal.
    plan = _formatted_plan(spark, "sql14_parameterized", sf_dir)
    assert "EqualTo(c_mktsegment,MACHINERY)" in plan, plan[:2000]


def test_media_pipeline_decodes_once(spark, sf_dir):
    # e2: ONE Arrow decode pass emits phash + channel sums — a second
    # MapInPandas or a media re-join would shuffle raster payloads
    # (measured 4.7 s -> 2.8 s when folded).
    plan = _formatted_plan(spark, "e2_media_pipeline", sf_dir)
    n_decodes = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") MapInPandas" in ln
    )
    assert n_decodes == 1, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_interval_union_is_one_user_exchange(spark, sf_dir):
    # w19: both windows and both rollups key on user_id — one hash
    # exchange must serve all four (HashPartitioning(user_id)
    # satisfies the (user_id, island_id) grouping too); no join.
    plan = _formatted_plan(spark, "w19_interval_union", sf_dir)
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_shuffles == 1, plan[:2000]
    assert "Join type:" not in plan, plan[:2000]


def test_market_basket_pairs_by_orderkey_only(spark, sf_dir):
    # a49: pair generation is a map-side explode of the per-order
    # sorted brand set (bounded C(brands,2) fanout, r13 — no orderkey
    # self-join at all) — never a cartesian over brands; the brand
    # marginals and the 1-row total ride broadcasts.
    plan = _formatted_plan(spark, "a49_market_basket", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_string_agg_is_ordered_listagg(spark, sf_dir):
    # a48: the ordered aggregate must lower to listagg (sort-based
    # aggregate over the 25-row rollup), with the region dim
    # broadcast; the customer count aggregates before the join.
    plan = _formatted_plan(spark, "a48_string_agg", sf_dir)
    assert "listagg" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_unpivot_expands_after_preaggregation(spark, sf_dir):
    # sql15: UNPIVOT lowers to a map-side Expand; customer/supplier
    # counts must aggregate per nation BEFORE joining the dimension
    # spine (no customers-x-suppliers fanout).
    plan = _formatted_plan(spark, "sql15_unpivot_syntax", sf_dir)
    assert "Expand" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("HashAggregate") >= 4, plan[:2000]


def test_length_buckets_are_map_side_then_bounded_rollup(spark, sf_dir):
    # x72: tokenize + bucket id are codegen expressions; ONE
    # exchange for the bounded bucket rollup; no Python, no join.
    plan = _formatted_plan(spark, "x72_length_bucket_pack", sf_dir)
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_shuffles == 1, plan[:2000]
    assert "Join type:" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]


def test_calibration_curve_is_map_side_then_bounded_rollup(spark, sf_dir):
    # x73: score + label are map-side Column math; ONE exchange for
    # the 10-bin rollup; no Python, no join.
    plan = _formatted_plan(spark, "x73_calibration_curve", sf_dir)
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_shuffles == 1, plan[:2000]
    assert "Join type:" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]


def test_cusum_recurrence_runs_on_bounded_rollup(spark, sf_dir):
    # w20: the sequential recurrence (FlatMapGroupsInPandas) must sit
    # ABOVE the weekly aggregate — Python sees O(weeks) rows per key,
    # never raw orders.
    plan = _formatted_plan(spark, "w20_cusum_drift", sf_dir)
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert plan.count("HashAggregate") >= 2, plan[:2000]
    # The tree prints root-first, so the recurrence node must appear
    # BEFORE its aggregate input in the text (= executes after it).
    assert plan.index("FlatMapGroupsInPandas") < plan.index(
        "HashAggregate"
    ), plan[:3000]


def test_luhn_is_codegen_lambda_not_explode(spark, sf_dir):
    # f13: the checksum is transform/aggregate lambda arithmetic —
    # no Generate (explode), no Python, one bounded rollup exchange.
    plan = _formatted_plan(spark, "f13_luhn_checksum", sf_dir)
    assert "Generate" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    assert n_shuffles == 1, plan[:2000]


def test_js_divergence_pair_expansion_is_equi_join(spark, sf_dir):
    # x74: the O(S^2) pair fan-out must ride equi-joins against the
    # tiny pair table (broadcast), never an IN-condition nested loop
    # over the counts table.
    plan = _formatted_plan(spark, "x74_source_js_divergence", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]


def test_bloom_pointread_pushes_in_list(spark, sf_dir):
    # s20: the IN-list must reach the parquet scan so the reader can
    # consult row-group bloom filters.
    plan = _formatted_plan(spark, "s20_bloom_filter_pointread", sf_dir)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "In(user_id" in pushed[-1], pushed or plan[:2000]


def test_join_hints_change_strategy(spark, sf_dir):
    # sql16: the BROADCAST hint must plan a broadcast join; the
    # SHUFFLE_MERGE hint on the same query must plan a sort-merge —
    # proving the hint, not the size estimate, picked the strategy.
    from voter_file_etl_spark.plans.sql_surface import sql16_with_hint

    bcast = (
        sql16_with_hint(spark, sf_dir, "BROADCAST")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    merge = (
        sql16_with_hint(spark, sf_dir, "SHUFFLE_MERGE")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastHashJoin" in bcast, bcast[:2000]
    assert "SortMergeJoin" in merge, merge[:2000]


def test_rfm_windows_run_on_customer_rollup(spark, sf_dir):
    # a50: the three ntile windows must sit above the per-customer
    # aggregate (window input = customers, not orders) and the max
    # order date must attach as a broadcast, not a driver constant.
    plan = _formatted_plan(spark, "a50_rfm_segmentation", sf_dir)
    assert "Window" in plan, plan[:2000]
    assert "Broadcast" in plan, plan[:2000]
    assert plan.index("Window") < plan.index("HashAggregate") or plan.count(
        "HashAggregate"
    ) >= 4, plan[:2000]


def test_code_filter_is_map_side_rollup(spark, sf_dir):
    # x75: regexp features are codegen'd; one bounded source rollup.
    plan = _formatted_plan(spark, "x75_code_data_filter", sf_dir)
    assert "Join type:" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]


def test_rolling_corr_shares_one_window(spark, sf_dir):
    # w21: all six sufficient statistics must evaluate in ONE Window
    # node over one (priority, day-ordered) sort — six separate
    # windows would be six sorts.
    plan = _formatted_plan(spark, "w21_rolling_corr", sf_dir)
    assert plan.count(") Window") == 1, plan[:2000]
    assert "Join type:" not in plan, plan[:2000]


def test_timezone_localize_is_map_side(spark, sf_dir):
    # f14: from_utc_timestamp is codegen'd expression work — no join,
    # no Python anywhere.
    plan = _formatted_plan(spark, "f14_timezone_localize", sf_dir)
    assert "Join type:" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]


def test_dp_release_noise_is_per_cell(spark, sf_dir):
    # x77: the Laplace draw must be expression math on the bounded
    # release rollup — no join, no Python, one aggregate exchange.
    plan = _formatted_plan(spark, "x77_dp_noisy_release", sf_dir)
    assert "Join type:" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]


def test_group_by_all_lowers_to_partial_final(spark, sf_dir):
    # sql17: inferred grouping keys must still plan the ordinary
    # map-side partial + final aggregate.
    plan = _formatted_plan(spark, "sql17_group_by_all", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_bm25_probe_filter_reaches_scan(spark, sf_dir):
    # x78: the probe-subset predicate must push into the tf branch's
    # parquet scan (the df/dlen branches legitimately read all docs);
    # corpus stats ride a broadcast; no cartesian.
    plan = _formatted_plan(spark, "x78_bm25_scoring", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Broadcast" in plan, plan[:2000]
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("doc_id" in ln for ln in pushed), pushed or plan[:2000]


def test_kaplan_meier_windows_run_on_duration_rollup(spark, sf_dir):
    # a52: the risk-set and log-survival windows must sit above the
    # bounded duration rollup (two Window nodes total), with the
    # anchor date broadcast and no Python anywhere.
    plan = _formatted_plan(spark, "a52_kaplan_meier", sf_dir)
    assert plan.count(") Window") == 2, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan[:2000]


def test_holt_recurrence_runs_on_bounded_rollup(spark, sf_dir):
    # a53: same contract as w20 — the sequential smoother
    # (FlatMapGroupsInPandas) sees only the weekly rollup.
    plan = _formatted_plan(spark, "a53_holt_forecast", sf_dir)
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert plan.count("HashAggregate") >= 2, plan[:2000]
    assert plan.index("FlatMapGroupsInPandas") < plan.index(
        "HashAggregate"
    ), plan[:3000]


def test_referential_audit_uses_anti_joins(spark, sf_dir):
    # a54: every integrity check must plan as a left-anti join on
    # key-only projections — no NOT IN null-aware nested loops, no
    # cartesian.
    plan = _formatted_plan(spark, "a54_referential_audit", sf_dir)
    assert plan.count("LeftAnti") >= 4, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_transpose_flips_bounded_rollup_only(spark, sf_dir):
    # p11: transpose() materializes eagerly (the result IS a
    # LocalTableScan) — valid only because the input is the bounded
    # 5-row rollup; the gate pins the fixed 6-column transposed
    # schema so a raw-data transpose (unbounded columns) can't sneak
    # in.
    plan = _formatted_plan(spark, "p11_transpose", sf_dir)
    assert "LocalTableScan" in plan, plan[:2000]
    assert "Output [6]" in plan and "MIDDLE EAST" in plan, plan[:2000]


def test_entity_resolution_blocks_before_scoring(spark, sf_dir):
    # e4: candidate generation must be the blocked equi-join (d4's
    # shape) — no cartesian, no nested loop over the master.
    plan = _formatted_plan(spark, "e4_entity_resolution", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_zstd_writes_smaller_than_uncompressed(spark, sf_dir):
    # s23: the zstd files must actually be zstd (smaller than the
    # same rows uncompressed) and readable mixed with other codecs.
    import glob
    import os
    import tempfile

    from voter_file_etl_spark.tables import t as _t

    z = tempfile.mkdtemp(prefix="zstd_")
    u = tempfile.mkdtemp(prefix="uncmp_")
    df = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    df.repartition(1).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(z)
    df.repartition(1).write.mode("overwrite").option(
        "compression", "none"
    ).parquet(u)
    zs = sum(os.path.getsize(p) for p in glob.glob(z + "/*.parquet"))
    us = sum(os.path.getsize(p) for p in glob.glob(u + "/*.parquet"))
    assert 0 < zs < us, (zs, us)


def test_skyline_is_two_level_sweep(spark, sf_dir):
    # o7's skyline must never be the quadratic NOT-EXISTS shape: no
    # cartesian / nested-loop, the bucket-offset table joins back via
    # broadcast, and the within-bucket window is partitioned on bkt.
    plan = _formatted_plan(spark, "o7_skyline", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "hashpartitioning(bkt" in plan, plan[:2000]


def test_ohlc_is_single_shuffle_partial_agg(spark, sf_dir):
    # w29 is one groupBy(month) with map-side combine: exactly one
    # exchange on month and a partial_min_by in the pre-shuffle stage.
    plan = _formatted_plan(spark, "w29_ohlc", sf_dir)
    assert plan.count("+- Exchange") == 1, plan[:2000]
    assert "hashpartitioning(month" in plan, plan[:2000]
    assert "partial_min_by" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    # a68's popcount sum must equal exact count(distinct user_id) per
    # event_type — the bitmap is a lossless distinct representation.
    from pyspark.sql import functions as F

    from voter_file_etl_spark.tables import t

    got = {
        r["event_type"]: r["n_users"]
        for r in registry.QUERIES["a68_bitmap_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_bitmap_distinct_has_no_expand(spark, sf_dir):
    # a68 exists to AVOID the count-distinct expand: the plan must be
    # two hash aggregates with partial bit_or, no Expand node.
    plan = _formatted_plan(spark, "a68_bitmap_distinct", sf_dir)
    assert "Expand" not in plan, plan[:2000]
    assert "partial_bit_or" in plan, plan[:2000]


def test_inverted_index_rank_is_salted_two_level(spark, sf_dir):
    # x92's first rank window must partition on (w, doc_id % 64) —
    # never on the bare term, whose posting list is corpus-sized for
    # stopwords — and the top-500 pick must be TakeOrdered, not a
    # global window.
    plan = _formatted_plan(spark, "x92_inverted_index", sf_dir)
    assert "(doc_id" in plan and "% 64" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_dau_mau_has_no_distinct_window(spark, sf_dir):
    # a69's MAU must come from the bounded coverage explode + plain
    # count — never a 30-day range-frame distinct window (no Window
    # node at all) and never an Expand.
    plan = _formatted_plan(spark, "a69_dau_mau_stickiness", sf_dir)
    assert "Window" not in plan, plan[:2000]
    assert "Expand" not in plan, plan[:2000]
    assert "Generate" in plan, plan[:2000]


def test_label_propagation_round_rank_is_node_partitioned(spark):
    # g9's per-round argmax label must rank inside node partitions
    # (bounded by degree), never globally, and join edges->labels as
    # an equi-join. The final g9 plan hides the rounds behind
    # iter_checkpoint, so gate the factored round body directly.
    from voter_file_etl_spark.operators.graph import _lpa_round

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["src", "dst"]
    )
    labels = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["node", "label"])
    plan = _lpa_round(edges, labels)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "hashpartitioning(dst" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_label_propagation_conserves_nodes(spark, sf_dir):
    # Every customer lands in exactly one community (each custkey is a
    # dst of the symmetrized edges, so >= n members; the 1+(k*m+c)%n
    # formula can also mint a few node ids outside the key set), and
    # propagation actually merged labels (far fewer communities than
    # nodes).
    rows = registry.QUERIES["g9_label_propagation"](spark, sf_dir).collect()
    from voter_file_etl_spark.tables import t

    n = t(spark, sf_dir, "customer").count()
    members = sum(r["n_members"] for r in rows)
    assert n <= members <= n + 10
    assert len(rows) < n // 2


def test_equidepth_rank_is_two_level(spark, sf_dir):
    # a70's global rank must be the bucketed two-level prefix sum: a
    # bkt-partitioned cumsum window plus broadcast joins for the
    # O(buckets) offsets and the 1-row total — never a single global
    # cumsum over the distinct-value table.
    plan = _formatted_plan(spark, "a70_equidepth_histogram", sf_dir)
    assert "hashpartitioning(bkt" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_linterp_windows_partition_by_series(spark, sf_dir):
    # w30's fill windows must partition on the series key; a global
    # date-ordered window would single-partition the whole spine.
    plan = _formatted_plan(spark, "w30_resample_linterp", sf_dir)
    assert "hashpartitioning(prio" in plan, plan[:2000]
    assert "SinglePartition" not in plan, plan[:2000]


def test_power_iteration_gram_is_map_side(spark, sf_dir):
    # x94's Gram matrix must come from per-row outer products (two
    # chained Generates) — never a long-table self-join. The
    # registered key truncates the gram build behind iter_checkpoint
    # (r13: the untruncated doubly-self-referencing plan nested it
    # exponentially — 1021 nodes, 16 scans), so the Generate shape is
    # gated on the factored BUILD subtree (the _lpa_round pattern)
    # and the join/cartesian bans on the final plan.
    from voter_file_etl_spark.operators.similarity import _x94_gram_build

    build = _x94_gram_build(spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert build.count("Generate") >= 2, build[:2000]
    assert "Join" not in build, build[:2000]
    plan = _formatted_plan(spark, "x94_power_iteration_pc", sf_dir)
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_power_iteration_is_normalized(spark, sf_dir):
    # The emitted component is milli-normalized: max |component| is
    # exactly 1000 and the Rayleigh eigenvalue estimate is positive.
    rows = registry.QUERIES["x94_power_iteration_pc"](spark, sf_dir).collect()
    assert max(abs(r["pc_milli"]) for r in rows) == 1000
    assert all(r["ray_q"] > 0 for r in rows)
    assert len(rows) == 64


def test_cdc_chunker_is_partition_preserving(spark, sf_dir):
    # x95's Python chunker must consume the parquet scan directly —
    # no shuffle below MapInPandas; the only exchanges serve the
    # chunk-hash rollups.
    df = registry.QUERIES["x95_cdc_chunking"](spark, sf_dir)
    tree = df._jdf.queryExecution().executedPlan().toString()
    lines = tree.splitlines()
    mi = next(i for i, ln in enumerate(lines) if "MapInPandas" in ln)
    below = "\n".join(lines[mi : mi + 2])
    assert "FileScan" in below, below
    plan = _formatted_plan(spark, "x95_cdc_chunking", sf_dir)
    assert plan.count("+- Exchange") <= 3, plan[:2000]


def test_revenue_recognition_conserves_cents(spark, sf_dir):
    # Allocation with exact remainders: total recognized cents must
    # equal total order cents to the cent, across all months.
    from pyspark.sql import functions as F

    from voter_file_etl_spark.tables import t

    rec = (
        registry.QUERIES["a72_revenue_recognition"](spark, sf_dir)
        .agg(F.sum("recognized_c"))
        .collect()[0][0]
    )
    src = (
        t(spark, sf_dir, "orders")
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            )
        )
        .collect()[0][0]
    )
    assert rec == src


def test_revenue_bridge_identity_holds(spark, sf_dir):
    # The waterfall identity end = start + new + expansion -
    # contraction - churn must hold to the cent for every month.
    for r in registry.QUERIES["a73_revenue_bridge"](spark, sf_dir).collect():
        assert (
            r["end_c"]
            == r["start_c"]
            + r["new_c"]
            + r["expansion_c"]
            - r["contraction_c"]
            - r["churn_c"]
        ), r


def test_role_playing_dims_both_broadcast(spark, sf_dir):
    # j26: one conformed dim, two roles — BOTH joins must broadcast
    # and the lineitem fact must be scanned exactly once.
    plan = _formatted_plan(spark, "j26_role_playing_dates", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    # fact branch + the two 1-column bounds scans for the calendar
    # spine — never one re-scan per ROLE (the distinct-dates dim
    # would cost 5 lineitem scans; the spine caps it).
    assert plan.count("lineitem.parquet") <= 3, plan[:2000]


def test_duplicate_payments_blocks_on_amount(spark, sf_dir):
    # d7's candidates must come from an equi-join keyed on BOTH
    # custkey and cents — never a cartesian or a custkey-only join
    # with a residual amount filter.
    plan = _formatted_plan(spark, "d7_duplicate_payments", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    keys = [ln for ln in plan.splitlines() if "Left keys" in ln]
    assert keys and "cents" in keys[0] and "custkey" in keys[0], keys


def test_winnow_overlap_is_capped_equi_join(spark, sf_dir):
    # x98: fingerprint-collision pairs from the per-fingerprint doc
    # set with the df cap applied BEFORE pairing (r13: one aggregate
    # + map-side pair explode, no self-join); top-20 as TakeOrdered.
    plan = _formatted_plan(spark, "x98_winnow_overlap", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_merge_full_sync_is_single_full_outer(spark, sf_dir):
    # l26: one full-outer join on the key; the conditional delete is
    # a residual filter, not a second pass.
    plan = _formatted_plan(spark, "l26_merge_full_sync", sf_dir)
    assert "SortMergeJoin FullOuter" in plan, plan[:2000]
    # formatted mode prints each node twice (tree + detail): exactly
    # one full-outer join = exactly two mentions.
    assert plan.count("FullOuter") == 2, plan[:2000]


def test_revenue_bridge_join_is_co_partitioned(spark, sf_dir):
    # a73 pairs the rollup with its one-month shift: a shuffle join
    # on (cust, m) — no cartesian, no broadcast of a fact-sized side.
    plan = _formatted_plan(spark, "a73_revenue_bridge", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "FullOuter" in plan, plan[:2000]


def test_interval_intersect_is_pure_sweep(spark, sf_dir):
    # j25 must contain NO join at all — boundaries union, one
    # cust-partitioned window pass, rollup.
    plan = _formatted_plan(spark, "j25_interval_intersect_measure", sf_dir)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct"):
        assert node not in plan, f"unexpected {node}"
    assert "Window" in plan, plan[:2000]


def test_monthly_bands_window_is_month_partitioned(spark, sf_dir):
    # w28's rank window partitions by month — never a global sort.
    plan = _formatted_plan(spark, "w28_monthly_bands", sf_dir)
    assert "hashpartitioning(month" in plan, plan[:2000]
    assert "SinglePartition" not in plan, plan[:2000]


def test_ops_health_orphan_leg_is_anti_join(spark, sf_dir):
    # e6's referential leg must plan as LeftAnti on key-only
    # projections.
    plan = _formatted_plan(spark, "e6_ops_health", sf_dir)
    assert "LeftAnti" in plan, plan[:2000]


def test_feature_hashing_has_no_join(spark, sf_dir):
    # x96's selling point vs TF-IDF: NO vocabulary join — the plan
    # must contain no join node of any kind.
    plan = _formatted_plan(spark, "x96_feature_hashing", sf_dir)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, f"unexpected {node}"


def test_freshness_hwm_is_broadcast(spark, sf_dir):
    # a71's global high-water mark rides in as a broadcast 1-row
    # aggregate — never a shuffle join against the events table.
    plan = _formatted_plan(spark, "a71_freshness_audit", sf_dir)
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "Broadcast" in plan, plan[:2000]


def test_hotspot_neighbors_are_bounded_explode(spark, sf_dir):
    # a74's 8-neighbor claims are two 3-element Generates over the
    # CELL table; the comparison joins are equi, never cartesian.
    plan = _formatted_plan(spark, "a74_spatial_hotspots", sf_dir)
    assert plan.count("+- Generate") == 2, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_two_hop_reach_has_no_cartesian(spark, sf_dir):
    plan = _formatted_plan(spark, "g10_two_hop_reach", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_revenue_recognition_is_single_shuffle(spark, sf_dir):
    # a72: bounded explode then ONE exchange for the month rollup.
    plan = _formatted_plan(spark, "a72_revenue_recognition", sf_dir)
    assert "Generate" in plan, plan[:2000]
    assert plan.count("+- Exchange") == 1, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_code_switching_windows_partition_by_doc(spark, sf_dir):
    plan = _formatted_plan(spark, "x91_code_switching", sf_dir)
    assert "hashpartitioning(doc_id" in plan, plan[:2000]
    assert "SinglePartition" not in plan, plan[:2000]


def test_series_align_shares_one_window_pass(spark, sf_dir):
    # w31: both forward-fills must come out of ONE Window node.
    plan = _formatted_plan(spark, "w31_series_align", sf_dir)
    assert plan.count("+- Window") == 1, plan[:2000]


def test_storage_audit_is_one_scan_one_agg(spark, sf_dir):
    plan = _formatted_plan(spark, "s26_storage_footprint_audit", sf_dir)
    assert plan.count("documents.parquet") == 1, plan[:2000]


def test_fiscal_calendar_has_no_join(spark, sf_dir):
    # a75's mapping is pure column arithmetic — no calendar dim join.
    plan = _formatted_plan(spark, "a75_fiscal_445_calendar", sf_dir)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan, f"unexpected {node}"
    assert plan.count("+- Exchange") == 1, plan[:2000]


def test_set_op_precedence_is_standard(spark, sf_dir):
    # Cross-engine agreement alone can't distinguish standard
    # precedence from shared left-to-right parsing — pin the result
    # against an explicit ((a UNION (b INTERSECT c)) EXCEPT d)
    # reference computed in Python.
    import pandas as pd

    keys = set(
        pd.read_parquet(f"{sf_dir}/orders.parquet")["o_orderkey"].tolist()
    )
    a = {k for k in keys if k % 2 == 0}
    b = {k for k in keys if k % 3 == 0}
    c = {k for k in keys if k % 5 == 0}
    d = {k for k in keys if k % 7 == 0}
    expect = (a | (b & c)) - d
    row = registry.QUERIES["sql20_set_op_precedence"](spark, sf_dir).collect()[0]
    assert row["n_keys"] == len(expect)
    assert row["sum_keys"] == sum(expect)


def test_prefix_filter_join_never_all_pairs(spark, sf_dir):
    # x102's candidates must come from the PREFIX equi-join — no
    # cartesian anywhere, and the per-user prefix rank window is
    # user-partitioned (never a global sort of the membership table).
    plan = _formatted_plan(spark, "x102_prefix_filter_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "hashpartitioning(u" in plan, plan[:2000]


def test_projected_exists_is_decorrelated(spark, sf_dir):
    # sql24's three projected flags must plan as joins (decorrelated
    # semi/left joins), never per-row subquery execution or a
    # cartesian.
    plan = _formatted_plan(spark, "sql24_projected_exists", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "Join" in plan, plan[:2000]
    assert "Subquery" not in plan.split("== Physical Plan ==")[-1][:200], (
        plan[:2000]
    )


def test_pvm_reconciles_exactly_with_bounded_residual(spark, sf_dir):
    # a81's identity delta = price + volume + joint + residual must
    # hold to the cent, with the residual bounded by the truncation
    # dust (|resid| < q1 + q2 cents is implied by two floor divs).
    from voter_file_etl_spark.tables import t as _t
    from pyspark.sql import functions as F

    rows = registry.QUERIES["a81_price_volume_mix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["delta_c"]
            == r["price_effect_c"]
            + r["volume_effect_c"]
            + r["joint_effect_c"]
            + r["residual_c"]
        ), r
        assert abs(r["residual_c"]) < 10_000_000, r


def test_anti_range_join_is_bucketed_equi_anti(spark, sf_dir):
    # j27's |e - c| <= 90 s anti predicate has NO natural equi key; the
    # bucketization must plan it as a hash/SMJ LeftAnti on the time
    # bucket — never a cartesian or a broadcast nested loop (the shapes
    # a naive NOT EXISTS range predicate degenerates into).
    plan = _formatted_plan(spark, "j27_anti_range_join", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]


def test_conv2d_is_rowlocal_gather(spark, sf_dir):
    # m21's convolution is row-local gather work over the bounded
    # raster: the only Generate is the single-struct inline, and the
    # plan must have NO join, NO aggregate, and NO exchange — the
    # whole stencil runs in the scan stage. (A self-join of the pixel
    # table on shifted coordinates, or a per-cell shuffle, is the
    # 100 TB mistake.)
    plan = _formatted_plan(spark, "m21_conv2d_stencil", sf_dir)
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Join" not in phys, plan[:2000]
    assert "Generate" in phys, plan[:2000]  # the inline(...) unpack
    assert "Exchange" not in phys, plan[:2000]
    assert "HashAggregate" not in phys, plan[:2000]


def test_integral_image_is_rowlocal(spark, sf_dir):
    # m20: same discipline — the box identity's corner integrals are
    # row-local conditional prefix sums; no shuffle, no window.
    plan = _formatted_plan(spark, "m20_integral_image", sf_dir)
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Exchange" not in phys, plan[:2000]
    assert "Window" not in phys, plan[:2000]
    assert "Join" not in phys, plan[:2000]


def test_star_except_prunes_excluded_columns_at_scan(spark, sf_dir):
    # sql25's * EXCEPT must reach the parquet scan as column pruning:
    # the lineitem ReadSchema must not carry the excluded columns.
    plan = _formatted_plan(spark, "sql25_star_except", sf_dir)
    import re
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and all("l_tax" not in s and "l_discount" not in s for s in li), schemas


def test_multi_source_bfs_has_no_cartesian(spark, sf_dir):
    # g11 carries 4 landmarks in one frontier; every round must stay a
    # broadcast equi-join of frontier against the checkpointed edges.
    plan = _formatted_plan(spark, "g11_closeness_landmarks", sf_dir)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_dedup_pk_partial_min_before_shuffle(spark):
    # dedup_pk must keep its map-side combine: a partial_min aggregate
    # BELOW the hash exchange, so only one candidate row per PK per
    # task crosses the wire (vs the old window form, which shuffled
    # every duplicate then sorted whole partitions). The struct min
    # is SortAggregate (structs are not hash-aggregable) — the gate
    # is the partial/final split around the Exchange, not the
    # aggregate flavor.
    from voter_file_etl_spark.operators import etl

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "z", 3)],
        f"{etl.PK} string, s string, i int",
    )
    plan = etl.dedup_pk(df)._jdf.queryExecution().executedPlan().toString()
    pre, _, post = plan.partition("Exchange hashpartitioning(_dedup_pk")
    assert post, f"no hash exchange on the dedup key:\n{plan}"
    assert "partial_min" in post, f"no map-side partial min below the exchange:\n{plan}"
    assert "functions=[min(" in pre, f"no final min above the exchange:\n{plan}"


@pytest.mark.parametrize(
    ("key", "expr"),
    [
        ("x2_dedup_minhash", "array_intersect"),
        ("x4_ngram_jaccard", "array_intersect"),
        ("x29_fuzzy_decontaminate", "array_intersect"),
        ("x35_containment_dedup", "array_intersect"),
        ("x88_threshold_sweep", "array_intersect"),
        ("x38_minhash_accuracy", "array_intersect"),
        ("d4_record_linkage", "levenshtein"),
        ("f4_normalize_phone", "regexp_replace"),
        ("f8_hash_digest_funcs", "md5("),
        ("a83_bootstrap_ci", "md5("),
    ],
)
def test_expensive_expression_evaluates_once(spark, sf_dir, key, expr):
    # Each key's expensive per-row/per-pair expression must appear
    # exactly ONCE in the plan: written as a plain column expression,
    # projection collapse re-inlines it per reference (multiple output
    # columns, threshold filters over the computed alias) — 2-4
    # evaluations per row/pair at 100 TB volumes (r7 sweep; the m20
    # case was 100 regexp evaluations per doc through an explode). The
    # let-binding idiom (inline over a single-element transform) pins
    # it to one; this gate fails if a refactor reintroduces the
    # re-inline. (False-positive note: an expression INSIDE a partial
    # aggregate prints in both partial and final HashAggregate nodes
    # but evaluates once per row — such keys don't belong here.)
    plan = _formatted_plan(spark, key, sf_dir)
    n = plan.count(expr)
    assert n <= 1, f"{key}: {expr} appears {n}x in the plan"
