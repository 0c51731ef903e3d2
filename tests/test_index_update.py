"""Incremental index maintenance (kgspark.segments protocol).

The reference maintains its Lucene/vector indexes incrementally — every
add_episode upserts into indexes created once by
build_indices_and_constraints (/root/reference/graphiti_core/utils/
maintenance/graph_data_operations.py:73-80) — so the batch engine must
grow its persisted BM25/ANN indexes per delta batch without corpus
rebuilds. Invariant under test everywhere: an index built on corpus A and
updated with delta B behaves EXACTLY like an index freshly built on the
logical current corpus (A's surviving docs + B), including re-crawled ids
replacing their old versions.
"""

import pytest

pd = pytest.importorskip("pandas")

from pyspark.sql import functions as F  # noqa: E402

from kgspark import datapipe as dp  # noqa: E402
from kgspark import fulltext, segments  # noqa: E402


def _docs_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["uuid", "fact"]))


def _corpus_a(spark):
    rows = [(i, f"alpha doc {i} " + " ".join(
        ["join"] * (i % 4) + ["shuffle"] * (i % 3) + [f"w{i % 7}"]))
        for i in range(1, 41)]
    return _docs_df(spark, rows)


def _delta_b(spark):
    # 15 brand-new docs + 10 re-crawls of corpus-A ids with CHANGED text
    # (one of them, id 5, re-crawls to text with different length and terms)
    rows = [(i, f"beta doc {i} shuffle scan w{i % 5}")
            for i in range(100, 115)]
    rows += [(i, f"recrawled {i} join join gamma") for i in range(1, 11)]
    return _docs_df(spark, rows)


def _logical_corpus(spark):
    # corpus A minus the 10 re-crawled originals, plus all of delta B
    a = _corpus_a(spark).filter(~F.col("uuid").between(1, 10))
    return a.unionByName(_delta_b(spark))


QUERIES = ("join shuffle", "gamma", "beta scan", "alpha w3", "absentterm")


def _idx_scores(spark, path, q):
    return {r["uuid"]: r["score"] for r in
            fulltext.bm25_query_indexed(spark, path, q, limit=100).collect()}


def _scan_scores(df, q):
    return {r["uuid"]: r["score"] for r in
            fulltext.bm25_search(df, "fact", q, limit=100).collect()}


def test_fulltext_update_matches_fresh_build(spark, tmp_path):
    path = str(tmp_path / "ft")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=16)
    gen = fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    assert gen == 1 and segments.committed_gen(path) == 1
    logical = _logical_corpus(spark)
    for q in QUERIES:
        scan = _scan_scores(logical, q)
        idx = _idx_scores(spark, path, q)
        assert set(idx) == set(scan), q
        for k in scan:
            assert idx[k] == pytest.approx(scan[k], abs=1e-12), (q, k)


def test_fulltext_second_update_tombstones_chain(spark, tmp_path):
    # a doc re-crawled TWICE: gen-2 must tombstone the gen-1 version (not
    # the long-dead gen-0 one), and scores must track the latest text
    path = str(tmp_path / "ft2")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=16)
    fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    third = _docs_df(spark, [(1, "delta delta final"),
                             (200, "fresh delta doc")])
    assert fulltext.update_fulltext_index(third, "fact", path) == 2
    logical = (_logical_corpus(spark).filter("uuid <> 1")
               .unionByName(third))
    for q in ("delta final", "gamma", "join shuffle"):
        scan = _scan_scores(logical, q)
        idx = _idx_scores(spark, path, q)
        assert set(idx) == set(scan), q
        for k in scan:
            assert idx[k] == pytest.approx(scan[k], abs=1e-12), (q, k)


def test_fulltext_uncommitted_gen_is_invisible_then_cleaned(spark, tmp_path):
    # crash simulation: delete the gen-1 commit marker after an update —
    # readers must see the PRE-update snapshot; the next update must clean
    # the orphan rows and land correctly as the new gen 1
    from pathlib import Path
    path = str(tmp_path / "ft3")
    a = _corpus_a(spark)
    fulltext.build_fulltext_index(a, "fact", path, num_buckets=16)
    pre = {q: _idx_scores(spark, path, q) for q in QUERIES}
    fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    (Path(path) / "_commits" / "gen_1").unlink()  # "crash" before commit
    assert segments.committed_gen(path) == 0
    for q in QUERIES:
        now = _idx_scores(spark, path, q)
        assert set(now) == set(pre[q]) and all(
            now[k] == pytest.approx(pre[q][k], abs=1e-12) for k in now), q
    # recovery: re-run the update; orphaned gen-1 dirs are removed first
    removed = fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    assert removed == 1
    logical = _logical_corpus(spark)
    for q in QUERIES:
        scan = _scan_scores(logical, q)
        idx = _idx_scores(spark, path, q)
        assert set(idx) == set(scan) and all(
            idx[k] == pytest.approx(scan[k], abs=1e-12) for k in scan), q


def test_fulltext_compact_preserves_scores_and_purges(spark, tmp_path):
    from pathlib import Path
    path = str(tmp_path / "ft4")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=16)
    fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    before = {q: _idx_scores(spark, path, q) for q in QUERIES}
    n_rows_before = spark.read.parquet(path + "/postings").count()
    fulltext.compact_fulltext_index(spark, path)
    assert segments.committed_gen(path) == 0  # fresh single generation
    assert not (Path(path) / "deleted").exists()  # tombstones purged
    assert spark.read.parquet(path + "/postings").count() < n_rows_before
    for q in QUERIES:
        after = _idx_scores(spark, path, q)
        assert set(after) == set(before[q]) and all(
            after[k] == pytest.approx(before[q][k], abs=1e-12)
            for k in after), q
    # the compacted index keeps accepting updates
    fulltext.update_fulltext_index(
        _docs_df(spark, [(300, "gamma gamma")]), "fact", path)
    assert 300 in _idx_scores(spark, path, "gamma")


def test_fulltext_update_guards(spark, tmp_path):
    path = str(tmp_path / "ft5")
    with pytest.raises(ValueError, match="no committed fulltext index"):
        fulltext.update_fulltext_index(_corpus_a(spark), "fact", path)
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=16)
    dupes = _docs_df(spark, [(7, "x"), (7, "y")])
    with pytest.raises(ValueError, match="duplicate id"):
        fulltext.update_fulltext_index(dupes, "fact", path)
    # empty delta: no-op, no new generation published
    empty = _docs_df(spark, [(0, "x")]).filter("uuid < 0")
    assert fulltext.update_fulltext_index(empty, "fact", path) == 0


def _emb_df(spark, ids, shift=0.0):
    import numpy as np
    rows = []
    for i in ids:
        rng = np.random.RandomState(i)
        v = rng.randn(16) + shift
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))


def test_ann_update_matches_fresh_build(spark, tmp_path):
    path = str(tmp_path / "ann")
    a = _emb_df(spark, range(1, 50))
    dp.build_ann_index(a, path, n_planes=8)
    # delta: 20 new vectors + 5 re-embedded ids (DIFFERENT vectors — they
    # may move buckets, which only tombstoning handles correctly)
    delta = _emb_df(spark, list(range(100, 120)) + list(range(1, 6)),
                    shift=0.8)
    assert dp.update_ann_index(delta, path, n_planes=8) == 1
    logical = a.filter("vec_id >= 6").unionByName(delta)
    qv = [float(x) for x in
          _emb_df(spark, [999]).first()["embedding"]]
    # full-probe width == exact brute force over the logical corpus
    got = [(r["id"], r["cos"]) for r in
           dp.ann_query_indexed(spark, path, qv, k=10, n_planes=8,
                                probe_hamming=8).collect()]
    want = [(r["id"], r["cos"]) for r in
            dp.ann_bruteforce(logical, qv, 10).collect()]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, abs=1e-12)
    # compaction preserves results and keeps accepting updates
    dp.compact_ann_index(spark, path)
    got2 = [r["id"] for r in
            dp.ann_query_indexed(spark, path, qv, k=10, n_planes=8,
                                 probe_hamming=8).collect()]
    assert got2 == [i for i, _ in got]
    dp.update_ann_index(_emb_df(spark, [500]), path, n_planes=8)
    assert segments.committed_gen(path) == 1


def test_ivf_update_matches_fresh_assignment(spark, tmp_path):
    path = str(tmp_path / "ivf")
    a = _emb_df(spark, range(1, 40))
    dp.build_ivf_index(a, path, n_clusters=4, iters=2)
    delta = _emb_df(spark, list(range(200, 215)) + [1, 2], shift=0.5)
    assert dp.update_ivf_index(delta, path) == 1
    logical = a.filter("vec_id > 2").unionByName(delta)
    qv = [float(x) for x in _emb_df(spark, [998]).first()["embedding"]]
    # nprobe == n_clusters degenerates to exact brute force
    got = [r["id"] for r in
           dp.ann_ivf_indexed(spark, path, qv, k=8, nprobe=4).collect()]
    want = [r["id"] for r in dp.ann_bruteforce(logical, qv, 8).collect()]
    assert got == want


def test_index_update_replay_is_convergent(spark, tmp_path):
    # foreachBatch delivers at-least-once: a crashed micro-batch is
    # REPLAYED. incremental_ingest's convergence claim — the replayed
    # generation tombstones its own previous copy instead of duplicating —
    # pinned directly at the update level for all three index families.
    ft = str(tmp_path / "rft")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", ft,
                                  num_buckets=8)
    delta = _delta_b(spark)
    fulltext.update_fulltext_index(delta, "fact", ft)
    before = {q: _idx_scores(spark, ft, q) for q in QUERIES}
    assert fulltext.update_fulltext_index(delta, "fact", ft) == 2  # replay
    for q in QUERIES:
        after = _idx_scores(spark, ft, q)
        assert set(after) == set(before[q]), q
        for k in after:
            assert after[k] == pytest.approx(before[q][k], abs=1e-12), q
    ann = str(tmp_path / "rann")
    base = _emb_df(spark, range(1, 30))
    d = _emb_df(spark, [1, 2, 50], shift=0.5)
    dp.build_ann_index(base, ann, n_planes=8)
    dp.update_ann_index(d, ann)
    qv = [float(x) for x in _emb_df(spark, [99]).first()["embedding"]]
    want = [(r["id"], r["cos"]) for r in dp.ann_query_indexed(
        spark, ann, qv, k=10, probe_hamming=8).collect()]
    dp.update_ann_index(d, ann)  # replay
    got = [(r["id"], r["cos"]) for r in dp.ann_query_indexed(
        spark, ann, qv, k=10, probe_hamming=8).collect()]
    assert got == want
    ivf = str(tmp_path / "rivf")
    dp.build_ivf_index(base, ivf, n_clusters=4, iters=2)
    dp.update_ivf_index(d, ivf)
    want = [r["id"] for r in dp.ann_ivf_indexed(
        spark, ivf, qv, k=10, nprobe=4).collect()]
    dp.update_ivf_index(d, ivf)  # replay
    got = [r["id"] for r in dp.ann_ivf_indexed(
        spark, ivf, qv, k=10, nprobe=4).collect()]
    assert got == want


def _axis_emb_df(spark, specs):
    """Deterministic vectors near given axis directions: specs is a list of
    (vec_id, direction array). Small seeded noise decides ties."""
    import numpy as np
    rows = []
    for i, d in specs:
        rng = np.random.RandomState(i)
        v = np.asarray(d, dtype=np.float64) + rng.randn(len(d)) * 0.05
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))


def test_ivf_drift_metrics_and_retrain_recovers_recall(spark, tmp_path):
    # r4 verdict next #5: the frozen-centroid add path accumulates
    # quantizer drift. Scenario: the build corpus clusters on 4 axes; the
    # delta is a blob straddling the boundary between two of the original
    # cells, so its vectors split across cells and a small-nprobe query
    # into the blob misses the half in the unprobed cell. Drift is visible
    # in ivf_drift_metrics (delta gen fits worse); retrain_ivf_index
    # re-clusters the live rows (journaled swap) and recall recovers.
    import numpy as np
    path = str(tmp_path / "ivfdr")
    dim = 8
    axes = np.eye(dim)
    build = [(i, axes[i % 4]) for i in range(1, 41)]
    blob_dir = (axes[0] + axes[1]) / np.linalg.norm(axes[0] + axes[1])
    delta = [(i, blob_dir) for i in range(200, 230)]
    dp.build_ivf_index(_axis_emb_df(spark, build), path,
                       n_clusters=4, iters=2)
    dp.update_ivf_index(_axis_emb_df(spark, delta), path)
    m = {r["gen"]: r for r in dp.ivf_drift_metrics(spark, path).collect()}
    assert set(m) == {0, 1} and m[1]["n_vectors"] == 30
    assert m[1]["mean_centroid_sim"] < m[0]["mean_centroid_sim"] - 0.05
    logical = _axis_emb_df(spark, build + delta)
    qv = [float(x) for x in blob_dir]
    want = {r["id"] for r in dp.ann_bruteforce(logical, qv, 20).collect()}
    got_before = {r["id"] for r in
                  dp.ann_ivf_indexed(spark, path, qv, k=20,
                                     nprobe=1).collect()}
    recall_before = len(got_before & want) / len(want)
    assert recall_before < 0.999  # the blob straddles two cells
    cents = dp.retrain_ivf_index(spark, path, n_clusters=4, iters=3)
    assert len(cents) == 4
    # correctness invariant: full probe still equals brute force
    full = [r["id"] for r in
            dp.ann_ivf_indexed(spark, path, qv, k=20, nprobe=4).collect()]
    assert full == [r["id"] for r in
                    dp.ann_bruteforce(logical, qv, 20).collect()]
    got_after = {r["id"] for r in
                 dp.ann_ivf_indexed(spark, path, qv, k=20,
                                    nprobe=1).collect()}
    recall_after = len(got_after & want) / len(want)
    assert recall_after > recall_before
    assert recall_after >= 0.95  # the blob owns a cell again
    # retrained fit beats the drifted one, and the swap compacted the index
    m2 = dp.ivf_drift_metrics(spark, path).collect()
    assert [r["gen"] for r in m2] == [0]
    assert m2[0]["mean_centroid_sim"] > (
        (m[0]["mean_centroid_sim"] * 40 + m[1]["mean_centroid_sim"] * 30)
        / 70) - 1e-9
    # the retrained index keeps accepting updates
    assert dp.update_ivf_index(_axis_emb_df(spark, [(500, axes[2])]),
                               path) == 1


def test_ann_index_pins_n_planes(spark, tmp_path):
    # n_planes is baked into every stored bucket; the index remembers it so
    # an update or query with a mismatched value fails loudly instead of
    # probing/appending inconsistent buckets
    path = str(tmp_path / "annp")
    a = _emb_df(spark, range(1, 20))
    dp.build_ann_index(a, path, n_planes=8)
    with pytest.raises(ValueError, match="n_planes=6 does not match"):
        dp.update_ann_index(_emb_df(spark, [50]), path, n_planes=6)
    with pytest.raises(ValueError, match="does not match"):
        dp.ann_query_indexed(spark, path, [0.1] * 16, n_planes=12).collect()
    # omitted -> resolved from the index metadata (survives compaction)
    dp.update_ann_index(_emb_df(spark, [50]), path)
    dp.compact_ann_index(spark, path)
    qv = [float(x) for x in _emb_df(spark, [999]).first()["embedding"]]
    got = dp.ann_query_indexed(spark, path, qv, k=5, probe_hamming=8)
    assert got.count() == 5


def test_fulltext_update_rejects_group_schema_drift(spark, tmp_path):
    # group_id must be all-generations-or-none: a delta disagreeing with
    # the build would read back as NULL group rows and silently vanish
    # from group-filtered queries
    path = str(tmp_path / "ftg")
    grouped = _corpus_a(spark).withColumn("group_id", F.lit("g0"))
    fulltext.build_fulltext_index(grouped, "fact", path, num_buckets=8)
    with pytest.raises(ValueError, match="WITH a group_id"):
        fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    path2 = str(tmp_path / "ftg2")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path2,
                                  num_buckets=8)
    with pytest.raises(ValueError, match="WITHOUT a group_id"):
        fulltext.update_fulltext_index(
            _delta_b(spark).withColumn("group_id", F.lit("g1")),
            "fact", path2)


def _grouped_corpus(spark, rows):
    # group assignment derived from the id so build/delta/oracle agree
    return (_docs_df(spark, rows)
            .withColumn("group_id",
                        F.concat(F.lit("g"), F.pmod("uuid", F.lit(3)))))


def test_bm25_indexed_group_filter_parity(spark, tmp_path):
    # r4 verdict missing #2: group-filtered indexed BM25 must reproduce
    # bm25_search(group_ids=...)'s filter-local stats EXACTLY — per-group
    # (n_docs, total_len) deltas are maintained per generation and summed
    # at read; 'global' keeps the Lucene-faithful index-global stats
    path = str(tmp_path / "ftgp")
    a = _grouped_corpus(spark, [(i, f"alpha doc {i} " + " ".join(
        ["join"] * (i % 4) + ["shuffle"] * (i % 3))) for i in range(1, 41)])
    fulltext.build_fulltext_index(a, "fact", path, num_buckets=16)
    delta = _grouped_corpus(
        spark, [(i, f"beta doc {i} shuffle scan") for i in range(100, 115)]
        + [(i, f"recrawled {i} join gamma") for i in range(1, 11)])
    fulltext.update_fulltext_index(delta, "fact", path)
    logical = (a.filter(~F.col("uuid").between(1, 10)).unionByName(delta))
    for gids in (["g0"], ["g1", "g2"], ["g0", "g1", "g2"], ["absent"]):
        for q in ("join shuffle", "gamma", "beta scan"):
            scan = {r["uuid"]: r["score"] for r in fulltext.bm25_search(
                logical, "fact", q, limit=100, group_ids=gids).collect()}
            idx = {r["uuid"]: r["score"] for r in fulltext.bm25_query_indexed(
                spark, path, q, limit=100, group_ids=gids).collect()}
            assert set(idx) == set(scan), (gids, q)
            for k in scan:
                assert idx[k] == pytest.approx(scan[k], abs=1e-12), (gids, q)
    # group-filter parity survives compaction (deltas consolidated)
    fulltext.compact_fulltext_index(spark, path)
    scan = {r["uuid"]: r["score"] for r in fulltext.bm25_search(
        logical, "fact", "join shuffle", limit=100,
        group_ids=["g1"]).collect()}
    idx = {r["uuid"]: r["score"] for r in fulltext.bm25_query_indexed(
        spark, path, "join shuffle", limit=100, group_ids=["g1"]).collect()}
    assert set(idx) == set(scan)
    for k in scan:
        assert idx[k] == pytest.approx(scan[k], abs=1e-12)
    # 'global' scope: same candidates, index-global stats (Lucene behavior)
    glob = fulltext.bm25_query_indexed(spark, path, "join shuffle", limit=100,
                                       group_ids=["g1"],
                                       stats_scope="global").collect()
    assert {r["uuid"] for r in glob} == set(scan)
    with pytest.raises(ValueError, match="'local' or 'global'"):
        fulltext.bm25_query_indexed(spark, path, "x", stats_scope="bogus")


def test_bm25_indexed_group_local_needs_grouped_index(spark, tmp_path):
    path = str(tmp_path / "ftng")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=8)
    with pytest.raises(ValueError, match="no per-group stats"):
        fulltext.bm25_query_indexed(spark, path, "alpha", group_ids=["g0"])
    # explicit global scope works on ungrouped... a group filter over an
    # ungrouped index can never match, but must not raise at plan time
    got = fulltext.bm25_query_indexed(spark, path, "alpha",
                                      stats_scope="global")
    assert got.count() > 0


def test_fulltext_update_collision_scan_prunes_docs(spark, tmp_path):
    # r4 verdict missing #3: docs/ is id-bucketed so the update-time
    # collision scan prunes to the delta ids' buckets — assert the
    # partition filter reaches the parquet scan, and that pruned results
    # equal the unpruned live-docs view restricted to those buckets
    path = str(tmp_path / "ftpr")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=16)
    fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    committed = segments.committed_gen(path)
    bks = [fulltext.term_bucket(str(i), 16) for i in (1, 2, 3)]
    pruned = fulltext._live_docs(spark, path, committed, sorted(set(bks)))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "id_bucket" in plan
    full = fulltext._live_docs(spark, path, committed)
    want = {r["id"] for r in full.collect()
            if fulltext.term_bucket(str(r["id"]), 16) in set(bks)}
    assert {r["id"] for r in pruned.collect()} == want


def test_ann_update_collision_scan_prunes_ids(spark, tmp_path):
    # same pruning contract for the vector indexes: collision detection
    # reads the ids/ sidecar pruned to the delta's id buckets
    path = str(tmp_path / "annpr")
    dp.build_ann_index(_emb_df(spark, range(1, 50)), path, n_planes=8)
    delta = _emb_df(spark, [1, 2, 100], shift=0.3)
    live = dp._ann_live_id_rows(
        spark, path, 0, "vec_id",
        dp._delta_id_buckets(delta, "vec_id", dp.DEFAULT_ID_BUCKETS))
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "id_bucket" in plan
    # correctness of the full update cycle is pinned by
    # test_ann_update_matches_fresh_build; here pin that the pruned view
    # still sees the colliding ids
    got = {r["vec_id"] for r in live.collect()}
    assert {1, 2} <= got


def test_fulltext_compact_crash_midswap_recovers(spark, tmp_path):
    # compaction journal: marker written only after staging is fully
    # committed, so recovery (finish_swap at the next writer's entry) is
    # unconditional — drop what remains of the old root, move staging in
    import shutil
    from pathlib import Path
    path = str(tmp_path / "ftc")
    fulltext.build_fulltext_index(_corpus_a(spark), "fact", path,
                                  num_buckets=8)
    fulltext.update_fulltext_index(_delta_b(spark), "fact", path)
    want = {q: _idx_scores(spark, path, q) for q in QUERIES}
    # stage a full compacted copy + journal marker, then "crash" with the
    # old root half-deleted (the worst interruption point)
    staging = path + ".compact.staging"
    shutil.copytree(path, staging)
    marker = segments.swap_marker(path)
    marker.write_text(staging)
    shutil.rmtree(Path(path) / "docs")  # partial delete of the old root
    # next writer entry finishes the swap before doing anything else
    gen = fulltext.update_fulltext_index(
        _docs_df(spark, [(400, "gamma fresh")]), "fact", path)
    assert gen == 2 and not marker.exists() and not Path(staging).exists()
    got = _idx_scores(spark, path, "gamma")
    assert 400 in got
    for q in QUERIES:
        now = {k: v for k, v in _idx_scores(spark, path, q).items()
               if k != 400}
        # pre-crash docs keep their pre-crash scores (400's arrival only
        # perturbs stats, so compare on the query with no 400 overlap)
        if q == "gamma":
            continue
        assert set(now) == set(want[q]), q
