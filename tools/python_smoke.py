#!/usr/bin/env python3
"""Driver-side smoke test of the Python shim (python/graft): create,
insert, upsert, delete, load CSV, and read back through the graft
catalog — the same flow the reference's python suite drives against
HBaseSQLContext. Run from the repo root after `sbt compile`:

    python3 tools/python_smoke.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))
from graft import GraftSession  # noqa: E402

CLASSES = os.path.join(os.path.dirname(__file__), "..",
                       "target", "scala-2.13", "classes")


def main():
    root = tempfile.mkdtemp(prefix="graft_py_")
    spark = GraftSession.build(catalog_root=root, classes=CLASSES)
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.py")
        GraftSession.create_table(spark, "graft.py.t",
                                  "k BIGINT, v STRING", key="k")
        spark.sql("INSERT INTO graft.py.t VALUES (1, 'a'), (2, 'b')")
        # Put-upsert: re-inserting key 2 replaces it
        spark.sql("INSERT INTO graft.py.t VALUES (2, 'b2')")
        rows = {r.k: r.v for r in spark.sql(
            "SELECT k, v FROM graft.py.t ORDER BY k").collect()}
        assert rows == {1: "a", 2: "b2"}, rows
        # DELETE via tombstones
        spark.sql("DELETE FROM graft.py.t WHERE k = 1")
        rows = [r.k for r in spark.sql("SELECT k FROM graft.py.t").collect()]
        assert rows == [2], rows
        # LOAD DATA INPATH (bulk load statement)
        csv = os.path.join(root, "in.csv")
        with open(csv, "w") as f:
            f.write("10|x\n11|y\n")
        GraftSession.load_csv(spark, csv, "graft.py.t", delimiter="|")
        n = spark.sql("SELECT count(*) AS c FROM graft.py.t").collect()[0].c
        assert n == 3, n
        # time travel: the post-upsert, pre-delete snapshot still has k=1
        tdir = os.path.join(root, "py", "t")
        vs = sorted(int(f.rsplit("v", 1)[1]) for f in os.listdir(tdir)
                    if f.startswith("_graft_segments.v"))
        # catalog CREATE seeds an empty v1 snapshot, then one per commit
        assert len(vs) == 5, vs  # create(empty), insert, upsert, delete, load
        hist = {r.k: r.v for r in
                GraftSession.table_as_of(spark, "graft.py.t", vs[2]).collect()}
        assert hist == {1: "a", 2: "b2"}, hist
        # native function registered by the extensions
        h = spark.sql("SELECT rolling_hash(v) AS h FROM graft.py.t "
                      "WHERE k = 10").collect()[0].h
        assert h != 0
        # SQL row-level DML via the DSv2 delta path
        GraftSession.update(spark, "graft.py.t", "v = 'upd'", "k = 10")
        st = {r.k: r.v for r in spark.table("graft.py.t").collect()}
        assert st[10] == "upd", st
        spark.sql("SELECT CAST(2 AS BIGINT) AS k, 'm' AS v "
                  "UNION ALL SELECT CAST(12 AS BIGINT), 'new'"
                  ).createOrReplaceTempView("msrc")
        GraftSession.merge(spark, "graft.py.t", "msrc", "t.k = s.k",
                           "WHEN MATCHED THEN UPDATE SET * "
                           "WHEN NOT MATCHED THEN INSERT *")
        st = {r.k: r.v for r in spark.table("graft.py.t").collect()}
        assert st == {2: "m", 10: "upd", 11: "y", 12: "new"}, st
        snaps = GraftSession.show_snapshots(spark, "graft.py.t").collect()
        assert len(snaps) >= 6, snaps
        # secondary index lifecycle: create -> in-sync lookup ->
        # stale after a write -> refresh -> drop
        GraftSession.create_index(spark, "graft.py.t", "iv", ["v"])
        idx = GraftSession.show_indexes(spark, "graft.py.t").collect()
        assert [r.index_name for r in idx] == ["iv"], idx
        assert idx[0].in_sync, idx
        got = sorted(r.k for r in spark.sql(
            "SELECT k FROM graft.py.t WHERE v = 'upd'").collect())
        assert got == [10], got
        spark.sql("INSERT INTO graft.py.t VALUES (99, 'upd')")
        assert not GraftSession.show_indexes(
            spark, "graft.py.t").collect()[0].in_sync
        GraftSession.refresh_index(spark, "graft.py.t", "iv")
        assert GraftSession.show_indexes(
            spark, "graft.py.t").collect()[0].in_sync
        got = sorted(r.k for r in spark.sql(
            "SELECT k FROM graft.py.t WHERE v = 'upd'").collect())
        assert got == [10, 99], got
        GraftSession.drop_index(spark, "graft.py.t", "iv")
        assert GraftSession.show_indexes(
            spark, "graft.py.t").collect() == []
        # materialized view lifecycle over the same table
        GraftSession.create_materialized_view(
            spark, "graft.py.t", "mv", ["v"], ["k"], minmax_cols=["k"])
        mvs = GraftSession.show_materialized_views(
            spark, "graft.py.t").collect()
        assert [r.view_name for r in mvs] == ["mv"] and mvs[0].in_sync, mvs
        spark.sql("INSERT INTO graft.py.t VALUES (55, 'upd')")
        GraftSession.refresh_materialized_view(spark, "graft.py.t", "mv")
        agg = {r.v: (r.cnt, r.sum_k) for r in spark.sql(
            "SELECT v, count(*) AS cnt, sum(k) AS sum_k "
            "FROM graft.py.t GROUP BY v").collect()}
        tdir = os.path.join(root, "py", "t")
        mv_rows = {r.v: (r.cnt, r.sum_k) for r in spark.read.format("graftkv")
                   .load(os.path.join(tdir, "_mv", "mv"))
                   .selectExpr("v", "__cnt AS cnt", "__sum_k AS sum_k")
                   .collect()}
        assert mv_rows == agg, (mv_rows, agg)
        mm = {r.v: (r.min_k, r.max_k) for r in spark.read.format("graftkv")
              .load(os.path.join(tdir, "_mv", "mv"))
              .selectExpr("v", "__min_k AS min_k", "__max_k AS max_k")
              .collect()}
        mm_truth = {r.v: (r.mn, r.mx) for r in spark.sql(
            "SELECT v, min(k) AS mn, max(k) AS mx "
            "FROM graft.py.t GROUP BY v").collect()}
        assert mm == mm_truth, (mm, mm_truth)
        GraftSession.drop_materialized_view(spark, "graft.py.t", "mv")
        # metadata statistics statement: the table carries tombstones
        # from the DELETE above, so the rows claim degrades to NULL
        # ("NULL, never a wrong number") until compaction clears them
        stats = GraftSession.analyze(spark, "graft.py.t",
                                     columns=["k"]).collect()
        assert stats[0].name == "(table)" and stats[0].rows is None, stats
        spark.sql("COMPACT TABLE graft.py.t MAJOR")
        live = spark.sql("SELECT count(*) AS c FROM graft.py.t").collect()[0].c
        stats = GraftSession.analyze(spark, "graft.py.t",
                                     columns=["k"]).collect()
        assert stats[0].rows == live, (stats, live)
        # t.columns metadata relation: exact null counts + V11 quartiles
        cols = {r.column_name: r for r in
                GraftSession.columns_stats(spark, "graft.py.t").collect()}
        assert cols["k"].null_count == 0, cols
        assert cols["k"].p25 is not None and \
            cols["k"].p25 <= cols["k"].p50 <= cols["k"].p75, cols
        assert cols["v"].p50 is None, cols  # strings carry no quantiles
        # pruning report over a point lookup (1 live segment post-compact)
        q = spark.sql("SELECT v FROM graft.py.t WHERE k = 10")
        q.collect()
        rep = GraftSession.pruning_report(q).collect()
        assert len(rep) == 1 and rep[0].segments_read <= rep[0].segments_live
        assert "k" in rep[0].pushed_filters, rep
        # one-row health summary (post-compaction: exact live rows)
        det = GraftSession.describe_detail(spark, "graft.py.t").collect()[0]
        assert det.live_rows == live and det.tombstones == 0, det
        assert det.key_columns == "k" and det.overlap_depth <= 1, det
        # gap-fill resample through the shim (tick exactly on the obs)
        obs = spark.sql(
            "SELECT CAST(1 AS BIGINT) AS user_id, "
            "TIMESTAMP '2024-01-01 02:00:00' AS ts, 5.0 AS value "
            "UNION ALL SELECT 1, TIMESTAMP '2024-01-01 03:30:00', 7.0")
        ticks = GraftSession.resample_forward_fill(obs).collect()
        assert [(t.tick.hour, t.value) for t in ticks] == \
            [(2, 5.0), (3, 5.0)], ticks
        # retrieval + fuzzy matching through the shim
        docs = spark.sql(
            "SELECT CAST(0 AS BIGINT) AS doc_id, 'spark scan fast' AS text "
            "UNION ALL SELECT 1, 'spark spark window' "
            "UNION ALL SELECT 2, 'other words only'")
        top = GraftSession.bm25_top_k(docs, ["spark"], k=2).collect()
        assert [t.doc_id for t in top] == [1, 0], top  # tf 2 beats tf 1
        docs.createOrReplaceTempView("smoke_docs")
        via_sql = GraftSession.search(spark, "smoke_docs", "spark", k=2).collect()
        assert [(r.doc_id, r.score) for r in via_sql] == \
            [(t.doc_id, t.score) for t in top], via_sql
        ph = GraftSession.phrase_counts(docs, ["spark", "scan"]).collect()
        assert [(p.doc_id, p.n_occ) for p in ph] == [(0, 1)], ph
        names = spark.sql(
            "SELECT CAST(1 AS BIGINT) AS id, 'kitten' AS name "
            "UNION ALL SELECT 2, 'sitten' UNION ALL SELECT 3, 'far'")
        fz = GraftSession.fuzzy_pairs(names, "id", "name").collect()
        assert [(f.id_a, f.id_b, f.dist) for f in fz] == [(1, 2, 1)], fz
        # materialized text-index lifecycle through the shim:
        # build -> probe == scan, append, delete -> probe == shrunk scan
        idx = tempfile.mkdtemp(prefix="graft_py_ir_")
        GraftSession.text_index_build(docs, idx)
        via_idx = GraftSession.text_index_search(
            spark, idx, ["spark"], k=2).collect()
        assert [(r.doc_id, r.score) for r in via_idx] == \
            [(t.doc_id, t.score) for t in top], via_idx
        GraftSession.text_index_append(
            spark.sql("SELECT CAST(3 AS BIGINT) AS doc_id, "
                      "'spark scan spark' AS text"), idx)
        ph_idx = GraftSession.text_index_phrase(
            spark, idx, ["spark", "scan"]).collect()
        assert sorted((p.doc_id, p.n_occ) for p in ph_idx) == \
            [(0, 1), (3, 1)], ph_idx
        GraftSession.text_index_delete(spark, idx, [0, 3])
        shrunk = GraftSession.text_index_search(
            spark, idx, ["spark"], k=5).collect()
        assert [r.doc_id for r in shrunk] == [1], shrunk
        # incremental MinHash dedup through the shim: index a corpus,
        # probe an arriving near-dup batch, append it, replay-append
        mh = tempfile.mkdtemp(prefix="graft_py_mh_")
        corpus = spark.sql(
            "SELECT CAST(0 AS BIGINT) AS doc_id, "
            "'the quick brown fox jumps over the lazy dog and runs home'"
            " AS text "
            "UNION ALL SELECT 1, 'totally unrelated words about engines'")
        batch = spark.sql(
            "SELECT CAST(10 AS BIGINT) AS doc_id, "
            "'the quick brown fox jumps over the lazy dog and runs home"
            " tonight' AS text")
        GraftSession.minhash_index_build(corpus, mh)
        hits = GraftSession.minhash_index_probe(
            batch, mh, threshold=0.5).collect()
        assert [(h.doc_a, h.doc_b) for h in hits] == [(0, 10)], hits
        GraftSession.minhash_index_append(batch, mh)
        GraftSession.minhash_index_append(batch, mh)  # replay: no-op
        assert spark.read.parquet(mh + "/minhash").count() == 3
        fb, fa = GraftSession.minhash_index_compact(spark, mh)
        assert fa <= fb and fa >= 1, (fb, fa)
        assert spark.read.parquet(mh + "/minhash").count() == 3
        # batch k-NN join through the shim: axis-aligned toy vectors
        vecs = spark.sql(
            "SELECT CAST(0 AS BIGINT) AS vec_id,"
            " CAST(array(1.0, 0.0) AS ARRAY<FLOAT>) AS embedding "
            "UNION ALL SELECT 1, CAST(array(0.9, 0.1) AS ARRAY<FLOAT>) "
            "UNION ALL SELECT 2, CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)")
        nn = GraftSession.knn_join(
            vecs.where("vec_id = 0"), vecs, k=2).orderBy("rk").collect()
        assert [(r.neighbor_id, r.rk) for r in nn] == [(0, 1), (1, 2)], nn
        # leakage-safe split through the shim: near-dup cluster {0,1}
        # must land on ONE side wholesale; every doc gets a side
        sdocs = spark.sql("SELECT CAST(0 AS BIGINT) AS doc_id "
                          "UNION ALL SELECT 1 UNION ALL SELECT 2")
        spairs = spark.sql("SELECT CAST(0 AS BIGINT) AS doc_a, "
                           "CAST(1 AS BIGINT) AS doc_b")
        sp = GraftSession.split_by_cluster(sdocs, spairs, 50, seed=7)
        by = {r.doc_id: (r.cluster_id, r.split) for r in sp.collect()}
        assert set(by) == {0, 1, 2}, by
        assert by[0] == by[1], by  # same cluster -> same side
        assert all(s in ("train", "eval") for _, s in by.values()), by
        # streaming ANN ingest through the shim: file-source stream
        # bootstraps the durable index, a late file appends into it
        sdir = tempfile.mkdtemp(prefix="graft_py_annstream_")
        src = os.path.join(sdir, "src")
        ck = os.path.join(sdir, "ck")
        ann = os.path.join(sdir, "idx")
        v1 = spark.sql(
            "SELECT id AS vec_id, CAST(array(CAST(id AS FLOAT) + 1.0, "
            "1.0) AS ARRAY<FLOAT>) AS embedding FROM range(20)")
        v1.write.parquet(src)
        stream = spark.readStream.schema(v1.schema).parquet(src)
        q = GraftSession.ann_streaming_ingest(stream, ann, ck,
                                              n_centroids=2)
        try:
            q.processAllAvailable()
            assert spark.read.parquet(ann).count() == 20
            spark.sql(
                "SELECT id AS vec_id, CAST(array(CAST(id AS FLOAT) + 1.0,"
                " 1.0) AS ARRAY<FLOAT>) AS embedding FROM range(20, 30)"
            ).write.mode("append").parquet(src)
            q.processAllAvailable()
            assert spark.read.parquet(ann).count() == 30
        finally:
            q.stop()
        print("python smoke: OK")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
