"""Command-line query runner — entry point C of the reference lifecycle.

The reference CLI posts dynamic-query JSON to a running instance
(`helix query <instance> --file x.json | --json '<json>'`,
helix-cli/src/commands/query.rs:127-170, validating only request_type and
query presence client-side). This runner does the same against an embedded
engine over the driver's testdata, or any saved catalog:

    python -m helix_db_spark.cli query --json '<request json>'
    python -m helix_db_spark.cli query --file request.json \
        --data /root/testdata/sf0.01
    python -m helix_db_spark.cli query --file request.json \
        --store /path/saved-catalog
    python -m helix_db_spark.cli serve --data /root/testdata/sf0.001 \
        --port 6969

Output: the response JSON on stdout (one object keyed by the batch's
``returns`` names), non-zero exit + error JSON on stderr for bad requests.
"""

from __future__ import annotations

import argparse
import json
import sys


def _engine(args):
    from .engine import HelixSparkEngine
    from .session import get_spark

    spark = get_spark("helix-spark-cli",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if args.store:
        from .sources.store import load_catalog
        cat = load_catalog(spark, args.store)
    else:
        from .sources.tpch import load_graph
        cat = load_graph(spark, args.data)
    return HelixSparkEngine(cat)


def _load_request(args) -> dict:
    if args.json:
        return json.loads(args.json)
    if args.file:
        with open(args.file) as fh:
            return json.load(fh)
    return json.load(sys.stdin)


def cmd_query(args) -> int:
    request = _load_request(args)
    # client-side validation mirrors query.rs:172-187
    if request.get("request_type") not in ("read", "write"):
        print(json.dumps({"error": "request_type must be read|write"}),
              file=sys.stderr)
        return 2
    if "query" not in request:
        print(json.dumps({"error": "missing query"}), file=sys.stderr)
        return 2
    engine = _engine(args)
    try:
        out = engine.execute_json(request)
    except Exception as ex:  # noqa: BLE001 — CLI boundary
        print(json.dumps({"error": f"{type(ex).__name__}: {ex}"}),
              file=sys.stderr)
        return 1
    print(json.dumps(out))
    return 0


def cmd_card(args) -> int:
    """Dataset-card report for a documents table: per-source + corpus
    summary, top boilerplate bigrams, vocabulary profile — the numbers a
    corpus release publishes, straight from the pipeline operators."""
    from pyspark.sql import functions as F

    from .operators.textstats import dataset_card, top_ngrams, vocab_stats
    from .session import get_spark

    spark = get_spark("helix-spark-card",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.data}/documents.parquet")
    by = args.by if args.by in docs.columns else None
    card = [r.asDict() for r in
            dataset_card(docs, "doc_id", "text", by=by)
            .orderBy(F.col(by).asc_nulls_first() if by
                     else F.lit(1)).collect()]
    grams = [r.asDict() for r in
             top_ngrams(docs, "doc_id", "text", n=2,
                        k=args.top).collect()]
    vocab = vocab_stats(docs, "doc_id", "text").collect()[0].asDict()
    out = {"card": card, "top_bigrams": grams, "vocab": vocab}
    if args.topics:
        from .operators.pipeline import cluster_topics
        out["topics"] = [r.asDict() for r in
                         cluster_topics(docs, "doc_id", "text")
                         .orderBy("cell", "term_rank").collect()]
    print(json.dumps(out, default=str))
    return 0


def cmd_curate(args) -> int:
    """One-shot corpus curation: run the full recipe (quality gate ->
    repetition gate -> decontamination -> exact dedup -> split) over a
    documents table, write the curated corpus as parquet partitioned by
    split, and print a summary JSON (input/kept counts, per-split rows,
    mean quality)."""
    from pyspark.sql import functions as F

    from .operators.pipeline import curate_corpus
    from .session import get_spark

    spark = get_spark("helix-spark-curate",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.data}/documents.parquet")
    band = tuple(args.lm_band) if args.lm_band else None
    kept = curate_corpus(docs, min_quality=args.min_quality,
                         lm_band=band, gopher=args.gopher).persist()
    if args.out:
        kept.join(docs, on="doc_id") \
            .write.mode("overwrite").partitionBy("split") \
            .parquet(args.out)
    summary = (kept.groupBy("split")
               .agg(F.count(F.lit(1)).alias("rows"),
                    F.round(F.avg("quality"), 4).alias("mean_quality"))
               .orderBy("split").collect())
    shards = None
    if args.out and args.shards:
        from .operators.sampling import write_shards
        train = spark.read.parquet(args.out) \
            .filter(F.col("split") == "train")
        shards = write_shards(train, args.out + "_train_shards",
                              args.shards, "doc_id")
    kept.unpersist()
    print(json.dumps({
        "input_docs": docs.count(),
        # every kept row carries a split, so the summary partitions kept
        "kept_docs": sum(r["rows"] for r in summary),
        "out": args.out,
        "splits": [r.asDict() for r in summary],
        "train_shards": shards}, default=str))
    return 0


def cmd_classify(args) -> int:
    """Closed-form Naive Bayes filtering: train on the labeled docs
    whose ``doc_id % holdout-mod != 0``, score the rest (or a separate
    ``--batch`` parquet of (doc_id, text) rows), optionally write the
    predictions, and print a summary JSON (rows, per-class prediction
    counts, accuracy when true labels ride along)."""
    from pyspark.sql import functions as F

    from .operators.textstats import nb_classify
    from .session import get_spark

    spark = get_spark("helix-spark-classify",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.data}/documents.parquet")
    label = args.label
    train = docs.filter(F.col(label).isNotNull())
    if args.batch:
        test = spark.read.parquet(args.batch)
        missing = {"doc_id", "text"} - set(test.columns)
        if missing:
            print(json.dumps({"error": f"--batch parquet missing "
                              f"columns: {sorted(missing)}"}),
                  file=sys.stderr)
            return 2
        if label not in test.columns:
            test = test.withColumn(label, F.lit(None).cast("string"))
    else:
        m = args.holdout_mod
        train = train.filter(F.col("doc_id") % m != 0)
        test = docs.filter(F.col("doc_id") % m == 0)
    pred = nb_classify(train, test, "doc_id", "text", label).persist()
    if args.out:
        pred.write.mode("overwrite").parquet(args.out)
    counts = {r[f"pred_{label}"]: r["n"] for r in
              pred.groupBy(f"pred_{label}")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
    scored = pred.filter(F.col(f"true_{label}").isNotNull())
    n_true = scored.count()
    acc = (scored.filter(F.col(f"pred_{label}") == F.col(f"true_{label}"))
           .count() / n_true if n_true else None)
    n = sum(counts.values())  # same persisted rows — no extra job
    pred.unpersist()
    print(json.dumps({"rows": n, "label": label, "pred_counts": counts,
                      "accuracy": acc, "out": args.out}))
    return 0


def cmd_dedup(args) -> int:
    """Incremental dedup flow: ``--build-index`` writes the corpus's
    on-disk dedup index; with ``--batch`` the batch parquet is classified
    against it (exact / near / novel) and the annotations print as JSON
    lines."""
    from .operators.dedup import incremental_dedup, store_dedup_index
    from .session import get_spark

    if not args.build_index and not args.batch:
        print(json.dumps({"error": "pass --build-index or --batch"}),
              file=sys.stderr)
        return 2
    spark = get_spark("helix-spark-dedup",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if args.build_index:
        docs = spark.read.parquet(f"{args.data}/documents.parquet")
        store_dedup_index(docs, "doc_id", "text", args.index)
        print(json.dumps({"index": args.index,
                          "corpus_docs": docs.count()}))
        return 0
    from .operators.dedup import DedupFloodError
    mcp = args.max_candidate_pairs
    if mcp == "off":
        mcp = None
    elif mcp != "auto":
        try:
            mcp = int(mcp)
        except ValueError:
            # the subcommand JSON-error contract (ADVICE r12): a typo
            # like '10k' gets the same exit-2 shape as every other
            # cli input error, not an argparse-bypassing traceback
            print(json.dumps({"error": f"--max-candidate-pairs must be "
                              f"'off', 'auto', or an integer budget: "
                              f"{mcp!r}"}), file=sys.stderr)
            return 2
    batch = spark.read.parquet(args.batch)
    try:
        out = incremental_dedup(spark, batch, "doc_id", "text",
                                args.index, threshold=args.threshold,
                                max_candidate_pairs=mcp)
        rows = out.orderBy("doc_id").collect()
    except DedupFloodError as e:
        # fail fast WITH the mitigation text (r12 — the guard is armed
        # by default on this composed path, VERDICT r11 #4)
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2
    if args.append_novel:
        from pyspark.sql import functions as F

        from .operators.dedup import append_to_dedup_index
        # distributed left_semi (same shape as stream_dedup_ingest), not
        # collect + isin: a large delta batch would otherwise inline an
        # unbounded literal list into the plan and sit on driver memory
        novel = batch.join(
            out.filter(F.col("dup_kind").isNull()).select("doc_id"),
            on="doc_id", how="left_semi")
        append_to_dedup_index(novel, "doc_id", "text", args.index)
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    return 0


def cmd_warc(args) -> int:
    """Crawl ingestion: parse .warc/.warc.gz archives under ``--in``
    file-parallel, extract clean text from HTTP response payloads, and
    write a (doc_id, url, text) parquet corpus to ``--out`` (doc ids are
    md5-derived from the record URI — stable across re-runs). Prints a
    summary JSON."""
    from pyspark.sql import functions as F

    from .functions.text import md5_long
    from .session import get_spark
    from .sources.warc import extract_text, read_warc, read_wet

    if args.wet and args.http_ok_only:
        print(json.dumps({"error": "--http-ok-only applies to WARC "
                          "response records; WET conversion records "
                          "carry no HTTP status"}), file=sys.stderr)
        return 2
    spark = get_spark("helix-spark-warc",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if args.wet:
        wet = read_wet(spark, args.warc_in)
        out = wet.select(md5_long(F.col("url")).alias("doc_id"),
                         "url", "text")
    else:
        recs = read_warc(spark, args.warc_in) \
            .filter(F.col("warc_type") == "response")
        if args.http_ok_only:
            recs = recs.filter(F.col("http_status") == 200)
        out = extract_text(recs, "payload", "text").select(
            md5_long(F.col("target_uri")).alias("doc_id"),
            F.col("target_uri").alias("url"), "text")
    out.write.mode("overwrite").parquet(args.out)
    written = spark.read.parquet(args.out)
    print(json.dumps({
        "records": written.count(),
        "out": args.out,
        "mean_text_chars": written.agg(
            F.round(F.avg(F.length("text")), 1)).first()[0]}, default=str))
    return 0


def cmd_wds(args) -> int:
    """WebDataset shard IO: ``--pack <parquet>`` writes the corpus as
    multimodal tar shards (``--members ext=col,...`` picks the member
    columns, ``--shards N`` the shard count); ``--unpack <shard_dir>``
    reads shards file-parallel back to a member-level parquet. Prints a
    summary JSON either way."""
    from pyspark.sql import functions as F

    from .session import get_spark
    from .sources.webdataset import (read_webdataset, samples_view,
                                     write_webdataset)

    if bool(args.pack) == bool(args.unpack):
        print(json.dumps({"error": "exactly one of --pack/--unpack"}),
              file=sys.stderr)
        return 2
    spark = get_spark("helix-spark-wds",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if args.pack:
        if not args.out:
            print(json.dumps({"error": "--pack requires --out"}),
                  file=sys.stderr)
            return 2
        pairs = [kv.split("=", 1) for kv in args.members.split(",")]
        if any(len(kv) != 2 or not kv[0] or not kv[1] for kv in pairs):
            print(json.dumps({"error": "--members must be "
                              "ext=col[,ext=col...]"}), file=sys.stderr)
            return 2
        members = dict(pairs)
        df = spark.read.parquet(args.pack)
        missing = [c for c in ([args.key] + list(members.values()))
                   if c not in df.columns]
        if missing:
            print(json.dumps({"error": f"missing columns: {missing}"}),
                  file=sys.stderr)
            return 2
        # numeric keys are zero-padded (lexicographic == numeric order;
        # %019d covers the full non-negative int64 range so no id can
        # overflow the pad); any other type is used as-is — casting a
        # string key to long would NULL out and format_string would
        # collapse every sample onto the literal key "null". Negative
        # keys are rejected: "-0000000001" sorts before "-0000000002"
        # lexicographically, silently breaking the invariant.
        key = F.col(args.key)
        ktype = dict(df.dtypes)[args.key]
        is_int = ktype in ("tinyint", "smallint", "int", "bigint")
        k = F.format_string("%019d", key) if is_int else key.cast("string")
        invalid = key.isNull() | (key < 0) if is_int else key.isNull()
        if df.filter(invalid).limit(1).count():
            print(json.dumps(
                {"error": f"null or negative keys in {args.key!r}"}),
                file=sys.stderr)
            return 2
        keyed = df.select(k.alias("_k"), *members.values())
        n = write_webdataset(keyed.repartition(args.shards), args.out,
                             "_k", members)
        print(json.dumps({"shards": n, "samples": df.count(),
                          "out": args.out}))
        return 0
    rows = read_webdataset(spark, args.unpack.rstrip("/") + "/*.tar")
    if args.out:                        # summarize the parquet we just
        rows.write.mode("overwrite").parquet(args.out)  # wrote, not a
        rows = spark.read.parquet(args.out)             # second untar pass
    sv = samples_view(rows)
    agg = sv.agg(F.count(F.lit(1)), F.sum("n_members"),
                 F.sum("total_bytes")).first()
    print(json.dumps({"samples": agg[0], "members": agg[1],
                      "bytes": agg[2], "out": args.out}))
    return 0


def cmd_layout(args) -> int:
    """Data-layout maintenance: ``--zorder col1,col2`` rewrites the
    input clustered on the Morton key of those columns (row-group stats
    prune multi-dimensional box filters — sources/layout.py);
    ``--compact`` rewrites into ~``--target-mb``-sized files (the
    small-file maintenance task). Prints a summary JSON."""
    from .session import get_spark
    from .sources.layout import compact_parquet, zorder_write

    if bool(args.zorder) == bool(args.compact):
        print(json.dumps({"error": "exactly one of --zorder/--compact"}),
              file=sys.stderr)
        return 2
    spark = get_spark("helix-spark-layout",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    src = args.layout_in
    if args.compact:
        try:
            summary = compact_parquet(spark, src, args.out,
                                      target_mb=args.target_mb)
        except ValueError as e:       # non-local filesystem scheme
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2
        print(json.dumps({"op": "compact", "out": args.out, **summary}))
        return 0
    cols = [c for c in args.zorder.split(",") if c]
    if not cols:
        print(json.dumps({"error": "--zorder needs at least one column"}),
              file=sys.stderr)
        return 2
    df = spark.read.parquet(src)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        print(json.dumps({"error": f"missing columns: {missing}"}),
              file=sys.stderr)
        return 2
    try:
        zorder_write(df, cols, args.out, bits=args.bits,
                     files=args.files)
    except ValueError as e:  # empty input / all-NULL / reserved _zkey
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2
    out_df = spark.read.parquet(args.out)
    # row count from the freshly-written output (parquet footers of the
    # compacted files), not a third full scan of the source
    print(json.dumps({"op": "zorder", "cols": cols, "out": args.out,
                      "files": len(out_df.inputFiles()),
                      "rows": out_df.count()}))
    return 0


def cmd_merge(args) -> int:
    """Keyed-table lifecycle: ``--init <parquet>`` lays the table out
    key-range-partitioned (tight footer stats => file-pruned merges);
    ``--updates <parquet>`` MERGEs an update batch in, rewriting only
    the files the batch's key ranges touch and committing a new
    manifest version (sources/merge.py — read back any version with
    read_table); ``--vacuum-keep N`` retires data files no retained
    version references. With ``--latest-by`` an in-batch duplicate key
    keeps the max (version, ...) row. Prints a summary JSON."""
    from .session import get_spark
    from .sources.merge import (ConcurrentWriteError, latest_per_key,
                                merge_upsert, read_table, vacuum,
                                write_keyed_table)

    modes = [bool(args.init), bool(args.updates),
             args.vacuum_keep is not None]
    if sum(modes) != 1:
        print(json.dumps(
            {"error": "exactly one of --init/--updates/--vacuum-keep"}),
            file=sys.stderr)
        return 2
    spark = get_spark("helix-spark-merge",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if args.vacuum_keep is not None:
        try:
            stats = vacuum(spark, args.table, keep_versions=args.vacuum_keep)
        except ValueError as e:
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2
        print(json.dumps({"op": "vacuum", "table": args.table, **stats}))
        return 0
    if args.init:
        df = spark.read.parquet(args.init)
        if args.key not in df.columns:
            print(json.dumps({"error": f"missing key column {args.key}"}),
                  file=sys.stderr)
            return 2
        write_keyed_table(df, args.table, args.key, files=args.files)
        out = read_table(spark, args.table)
        print(json.dumps({"op": "init", "table": args.table,
                          "files": len(out.inputFiles()),
                          "rows": out.count()}))
        return 0
    upd = spark.read.parquet(args.updates)
    if args.latest_by:
        upd = latest_per_key(upd, args.key, args.latest_by)
    try:
        stats = merge_upsert(spark, args.table, upd, args.key,
                             allow_schema_evolution=args.evolve)
    except (ValueError, OSError, ConcurrentWriteError) as e:
        # ConcurrentWriteError is a RuntimeError, not an OSError — a
        # commit race (e.g. vs a streaming sink) must still produce the
        # JSON error contract + exit 2, not a raw traceback
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2
    print(json.dumps({"op": "merge", "table": args.table, **stats}))
    return 0


def cmd_ivf(args) -> int:
    """On-disk IVF vector-index lifecycle (operators/similarity.py — the
    maintenance story behind the served ANN probes): ``--build
    <parquet>`` writes the cell-partitioned layout; ``--append
    <parquet>`` assigns new vectors to the frozen centroids and appends
    (the skew report prints with the summary, and a ratio above
    ``--max-skew`` logs the recluster warning); ``--skew-report`` prints
    the cell-occupancy health JSON; ``--recluster`` rebuilds the coarse
    quantizer when skew exceeds ``--max-skew`` and is a reported no-op
    below it — safe for an unconditional maintenance cron (the Delta
    OPTIMIZE usage shape). Prints a summary JSON."""
    from .operators.similarity import (append_to_ivf_index,
                                       ivf_cell_skew_report,
                                       recluster_ivf_index,
                                       store_ivf_index)
    from .session import get_spark

    modes = [bool(args.build), bool(args.append),
             args.skew_report, args.recluster]
    if sum(map(bool, modes)) != 1:
        print(json.dumps({"error": "exactly one of --build/--append/"
                          "--skew-report/--recluster"}), file=sys.stderr)
        return 2
    from pyspark.errors import AnalysisException

    spark = get_spark("helix-spark-ivf",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.build:
            df = spark.read.parquet(args.build)
            for c in (args.id_col, args.vec_col):
                if c not in df.columns:
                    print(json.dumps({"error": f"missing column {c}"}),
                          file=sys.stderr)
                    return 2
            store_ivf_index(df, args.id_col, args.vec_col, args.index,
                            max_cells=args.max_cells,
                            refine_iters=args.refine_iters)
            print(json.dumps({"op": "build", "index": args.index,
                              **ivf_cell_skew_report(spark, args.index)}))
            return 0
        if args.append:
            report = append_to_ivf_index(spark.read.parquet(args.append),
                                         args.index,
                                         warn_skew=args.max_skew)
            print(json.dumps({"op": "append", "index": args.index,
                              **report}))
            return 0
        if args.skew_report:
            print(json.dumps({"op": "skew_report", "index": args.index,
                              **ivf_cell_skew_report(spark, args.index)}))
            return 0
        st = recluster_ivf_index(spark, args.index,
                                 max_skew=args.max_skew,
                                 refine_iters=args.refine_iters)
        print(json.dumps({"op": "recluster", "index": args.index, **st}))
        return 0
    # AnalysisException: missing index dir / batch without the meta
    # columns must honor the JSON-error + exit-2 contract like the
    # other failure modes (r10 review)
    except (ValueError, OSError, AnalysisException) as e:
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2


def cmd_knn(args) -> int:
    """kNN-graph build over an embedding parquet (operators/similarity
    .knn_graph — the engine surface for the HNSW-equivalent neighbor
    graph): writes (src, dst, rank, cosine) parquet and prints a summary
    JSON. ``--method auto`` counts the corpus and picks celled below the
    measured ~3M-vector crossover, NN-Descent above (README
    "Configuration" decision record)."""
    from pyspark.sql import functions as F

    from .operators.similarity import knn_graph, resolve_knn_method
    from .session import get_spark

    spark = get_spark("helix-spark-knn",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.errors import AnalysisException
    try:
        df = spark.read.parquet(args.input)
        for c in (args.id_col, args.vec_col):
            if c not in df.columns:
                print(json.dumps({"error": f"missing column {c}"}),
                      file=sys.stderr)
                return 2
        # resolve 'auto' HERE (one count) so the summary reports the
        # CONCRETE build that ran, not the literal 'auto' (ADVICE r12)
        method = args.method
        if method == "auto":
            n = df.filter(F.col(args.vec_col).isNotNull()).count()
            method = resolve_knn_method(n, args.max_cells)
            if method == "nndescent" and args.max_cells is not None:
                # pre-resolving auto here would otherwise skip
                # knn_graph's own knob-conflict warning — mirror it
                # (review r13): the cell knob has no meaning in the
                # NN-Descent build and is ignored, not an error, so
                # 'auto' keeps its adapt-to-n contract
                print(json.dumps({
                    "warning": f"--method auto resolved to nndescent at "
                               f"n={n}; --max-cells {args.max_cells} "
                               f"does not apply to that build and is "
                               f"ignored (pass --method celled to "
                               f"force the celled shape)"}),
                    file=sys.stderr)
        graph = knn_graph(df, args.id_col, args.vec_col, k=args.k,
                          max_cells=args.max_cells, method=method,
                          nndescent_iters=args.iters)
        graph.write.mode("overwrite").parquet(args.output)
        n_edges = spark.read.parquet(args.output).count()
        print(json.dumps({"op": "knn", "output": args.output,
                          "method": method,
                          "k": args.k, "edges": n_edges}))
        return 0
    except (ValueError, OSError, AnalysisException) as e:
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2


def cmd_bpe(args) -> int:
    """Tokenizer flow: ``--train`` learns BPE merges from the corpus's
    documents table (one distributed word-count pass, driver-side merge
    loop on the bounded type dict) and saves them under ``--model``;
    ``--encode`` tokenizes a parquet of (doc_id, text) with a saved
    model and writes (doc_id, bpe_tokens, n_tokens) parquet to
    ``--out``."""
    from pyspark.sql import functions as F

    from .operators.tokenizer import BpeModel, bpe_encode, bpe_train
    from .session import get_spark

    if not args.train and not args.encode:
        print(json.dumps({"error": "pass --train or --encode <parquet>"}),
              file=sys.stderr)
        return 2
    if args.train and args.encode:
        print(json.dumps({"error": "--train and --encode are separate "
                          "steps; run them one at a time"}),
              file=sys.stderr)
        return 2
    if args.encode and not args.out:
        print(json.dumps({"error": "--encode requires --out"}),
              file=sys.stderr)
        return 2
    spark = get_spark("helix-spark-bpe",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    if args.train:
        docs = spark.read.parquet(f"{args.data}/documents.parquet")
        model = bpe_train(docs, num_merges=args.merges,
                          max_words=args.max_words)
        model.save(spark, args.model)
        print(json.dumps({"model": args.model,
                          "merges": len(model.merges)}))
        return 0
    model = BpeModel.load(spark, args.model)
    docs = spark.read.parquet(args.encode)
    out = bpe_encode(docs, model).withColumn(
        "n_tokens", F.size("bpe_tokens"))
    out.write.mode("overwrite").parquet(args.out)
    stats = spark.read.parquet(args.out).agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("total_tokens")).first()
    print(json.dumps({"out": args.out, "docs": stats["docs"],
                      "total_tokens": stats["total_tokens"]}, default=str))
    return 0


def cmd_explain(args) -> int:
    """Print the executed physical plan for each returned variable of a
    dynamic-query request — the observability hook for verifying
    pushdown / broadcast / top-k shapes on a live catalog (the same
    properties tests/test_plans.py pins in CI)."""
    from .plans.wire import parse_request

    request = _load_request(args)
    engine = _engine(args)
    try:
        frames = engine.execute_batch(parse_request(request))
    except Exception as ex:  # noqa: BLE001 — CLI boundary
        print(json.dumps({"error": f"{type(ex).__name__}: {ex}"}),
              file=sys.stderr)
        return 1
    engine.spark.conf.set("spark.sql.maxMetadataStringLength", "20000")
    for name, df in frames.items():
        print(f"== {name} ==")
        print(df._jdf.queryExecution().executedPlan().toString())
    return 0


def cmd_serve(args) -> int:
    from .server import HelixSparkServer, QueryBundle

    bundle = None
    if args.bundle:
        with open(args.bundle) as fh:
            bundle = QueryBundle.from_json(json.load(fh))
    engine = _engine(args)
    if args.config:
        from .config import DbConfig

        if args.config.endswith(".toml"):
            dbc = DbConfig.from_toml(args.config, args.instance)
        else:
            dbc = DbConfig.from_json(args.config)
        engine.catalog.configure(dbc)
        print(f"db_config: {dbc}", file=sys.stderr)
    server = HelixSparkServer(engine, bundle)
    port = server.start(host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{port}/v1/query", file=sys.stderr)
    try:
        import threading
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="helix_db_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("query", cmd_query), ("serve", cmd_serve),
                     ("card", cmd_card), ("curate", cmd_curate),
                     ("dedup", cmd_dedup), ("classify", cmd_classify),
                     ("warc", cmd_warc),
                     ("wds", cmd_wds), ("layout", cmd_layout),
                     ("bpe", cmd_bpe), ("merge", cmd_merge),
                     ("ivf", cmd_ivf), ("knn", cmd_knn),
                     ("explain", cmd_explain)):
        p = sub.add_parser(name)
        p.add_argument("--data", default="/root/testdata/sf0.001",
                       help="testdata dir to load as the graph")
        p.add_argument("--store", help="saved catalog dir (sources/store.py)")
        p.set_defaults(fn=fn)
        if name in ("query", "explain"):
            p.add_argument("--json", help="inline request JSON")
            p.add_argument("--file", help="request JSON file")
        elif name == "serve":
            p.add_argument("--host", default="127.0.0.1")
            p.add_argument("--port", type=int, default=6969)
            p.add_argument("--bundle", help="queries.json stored-route bundle")
            p.add_argument("--config", help="reference helix.toml (or JSON "
                           "DbConfig) — wires vector_config knobs")
            p.add_argument("--instance", help="helix.toml instance name "
                           "to read vector_config from")
        elif name == "classify":
            p.add_argument("--label", default="lang",
                           help="label column to train on")
            p.add_argument("--holdout-mod", type=int, default=5,
                           help="doc_id %% M == 0 rows are scored")
            p.add_argument("--batch", help="separate parquet of docs to "
                           "score instead of the holdout")
            p.add_argument("--out", help="predictions parquet dir")
        elif name == "curate":
            p.add_argument("--out", help="curated-output parquet dir")
            p.add_argument("--min-quality", type=float, default=0.3)
            p.add_argument("--lm-band", nargs=2, type=float,
                           help="perplexity band percentiles, e.g. 0.05 0.95")
            p.add_argument("--gopher", action="store_true",
                           help="also require every Gopher quality rule")
            p.add_argument("--shards", type=int,
                           help="also write N train shards + manifest")
        elif name == "dedup":
            p.add_argument("--index", required=True,
                           help="on-disk dedup index dir")
            p.add_argument("--build-index", action="store_true")
            p.add_argument("--batch", help="delta batch parquet to check")
            p.add_argument("--threshold", type=float, default=0.7)
            p.add_argument("--append-novel", action="store_true",
                           help="append novel batch rows into the index")
            p.add_argument("--max-candidate-pairs",
                           dest="max_candidate_pairs", default="auto",
                           help="probe flood budget: 'auto' (default, "
                           "100/doc), an integer, or 'off'")
        elif name == "warc":
            p.add_argument("--in", dest="warc_in", required=True,
                           help=".warc/.warc.gz archive dir")
            p.add_argument("--out", required=True,
                           help="output parquet corpus dir")
            p.add_argument("--http-ok-only", action="store_true",
                           help="keep only HTTP 200 responses")
            p.add_argument("--wet", action="store_true",
                           help="read WET conversion records (text "
                           "pre-extracted by the crawl provider)")
        elif name == "wds":
            p.add_argument("--pack", help="(key, members...) parquet "
                           "to pack into tar shards")
            p.add_argument("--unpack", help="shard dir to read back")
            p.add_argument("--out", help="output dir (shards or parquet)")
            p.add_argument("--shards", type=int, default=8)
            p.add_argument("--key", default="doc_id")
            p.add_argument("--members", default="txt=text",
                           help="ext=col[,ext=col...] member mapping")
        elif name == "layout":
            p.add_argument("--in", dest="layout_in", required=True,
                           help="input parquet dir")
            p.add_argument("--out", required=True,
                           help="rewritten parquet dir")
            p.add_argument("--zorder", help="comma-separated numeric "
                           "columns to Morton-cluster by")
            p.add_argument("--compact", action="store_true",
                           help="merge small files instead")
            p.add_argument("--bits", type=int, default=12)
            p.add_argument("--files", type=int, default=32,
                           help="z-ordered output file count")
            p.add_argument("--target-mb", type=int, default=256,
                           help="compaction target file size")
        elif name == "merge":
            p.add_argument("--table", required=True,
                           help="keyed parquet table dir")
            p.add_argument("--key", default="doc_id")
            p.add_argument("--init", help="source parquet to lay out as "
                           "the keyed table")
            p.add_argument("--updates", help="update-batch parquet to "
                           "MERGE in")
            p.add_argument("--files", type=int, default=8,
                           help="file count for --init")
            p.add_argument("--latest-by", dest="latest_by",
                           help="version column resolving in-batch "
                           "duplicate keys (max wins)")
            p.add_argument("--vacuum-keep", dest="vacuum_keep", type=int,
                           help="retire data files outside the last N "
                           "versions instead of merging")
            p.add_argument("--evolve", action="store_true",
                           help="allow the update batch to add columns "
                           "(mergeSchema semantics)")
        elif name == "ivf":
            p.add_argument("--index", required=True,
                           help="on-disk IVF index dir (cells/ + "
                           "centroids/ + meta.json)")
            p.add_argument("--build", help="(id, vector) parquet to "
                           "index")
            p.add_argument("--append", help="new-vectors parquet to "
                           "assign + append")
            p.add_argument("--skew-report", dest="skew_report",
                           action="store_true",
                           help="print cell-occupancy health JSON")
            p.add_argument("--recluster", action="store_true",
                           help="rebuild the coarse quantizer if skew "
                           "exceeds --max-skew (no-op below)")
            p.add_argument("--id-col", dest="id_col", default="vec_id")
            p.add_argument("--vec-col", dest="vec_col",
                           default="embedding")
            p.add_argument("--max-cells", dest="max_cells", type=int,
                           default=4096,  # similarity.IVF_MAX_CELLS
                           help="centroid-count cap (actual count is "
                           "~sqrt(n), capped here)")
            p.add_argument("--max-skew", dest="max_skew", type=float,
                           default=4.0,
                           help="max/median cell-occupancy trigger")
            p.add_argument("--refine-iters", dest="refine_iters",
                           type=int, default=2,
                           help="Lloyd iterations for build/recluster")
        elif name == "knn":
            p.add_argument("--input", required=True,
                           help="(id, vector) parquet to build from")
            p.add_argument("--output", required=True,
                           help="(src, dst, rank, cosine) parquet dir")
            p.add_argument("--k", type=int, default=5,
                           help="neighbors per vector (HNSW's m)")
            p.add_argument("--method", default="auto",
                           choices=["auto", "exact", "celled",
                                    "nndescent"],
                           help="build strategy: auto picks celled "
                           "below ~3M vectors, NN-Descent above")
            p.add_argument("--max-cells", dest="max_cells", type=int,
                           default=None,
                           help="celled build's centroid cap")
            p.add_argument("--iters", type=int, default=3,
                           help="NN-Descent round ceiling (early-"
                           "terminates on Dong's delta criterion)")
            p.add_argument("--id-col", dest="id_col", default="vec_id")
            p.add_argument("--vec-col", dest="vec_col",
                           default="embedding")
        elif name == "bpe":
            p.add_argument("--model", required=True,
                           help="merges parquet dir (save/load)")
            p.add_argument("--train", action="store_true")
            p.add_argument("--merges", type=int, default=4000)
            p.add_argument("--max-words", type=int, default=200_000)
            p.add_argument("--encode", help="(doc_id, text) parquet "
                           "to tokenize")
            p.add_argument("--out", help="encoded-output parquet dir")
        else:
            p.add_argument("--by", default="source",
                           help="grouping column for the per-source card")
            p.add_argument("--top", type=int, default=10,
                           help="top bigram count")
            p.add_argument("--topics", action="store_true",
                           help="include the cluster topic map")
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
