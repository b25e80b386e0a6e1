"""Lifecycle maintenance for the persisted index layouts: copy-on-write
DELETE and small-file COMPACTION for the term-partitioned BM25 inverted
index (operators/text.py::write_bm25_index) and the cid-partitioned IVF
corpus (operators/similarity.py::write_ivf_corpus).

Round 5/7 built the CREATE + APPEND halves of the index lifecycle with
ingest-invariance gates; this module adds the other half. The design is
the standard lakehouse copy-on-write shape (Delta Lake / Iceberg DELETE:
one scan to locate affected files, rewrite only those, leave the rest
untouched) applied at PARTITION granularity, plus the Lucene-style
segment-merge compaction that undoes append fragmentation:

- **delete = one map-only scan + rewrite of affected partitions.** The
  victim rows are found with a broadcast semi-join against the deleted-id
  set (no shuffle of the index); only the partitions that actually hold a
  victim are rewritten, via Spark's dynamic partition overwrite. Dynamic
  overwrite only replaces partitions PRESENT in the written data, so a
  partition whose every row is deleted would silently keep its stale
  files — those directories are removed explicitly through the Hadoop
  FileSystem API (exactly what a lakehouse DELETE's commit does to
  dead files).
- **compaction = rewrite-new-then-swap.** Appends leave one file per
  batch per partition directory (the small-file problem); compaction
  rewrites the dataset with a pinned partition count into a sibling
  directory and atomically swaps it in, never overwriting the files it
  is still reading (the write-new/rename pattern of every production
  compactor; single-writer contract — concurrent readers of the swapped
  path race the rename, as they do in any non-transactional table).

Every operation here is gated by a probe-equivalence query: probing the
maintained layout must hash-match a from-scratch index built on the
surviving corpus (queries/extra_ops_r8b.py).

Reference analog: none — the reference (pandas/HDF5, single machine)
has no persisted index layouts; this is pure retrieval-infrastructure
extension, same family as write_bm25_index/append_ivf_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --- Hadoop FileSystem helpers (driver-side metadata ops) ----------------------


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API — the same
    mechanism Spark's own dynamic-overwrite commit uses to drop dead
    partition directories. Driver-side metadata call, never data."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _unescape_partition_value(name: str) -> str:
    """Reverse Hive/Spark partition-path escaping (%XX hex for reserved
    chars). Only the REVERSE direction is implemented on purpose: mapping
    directory names back to values is unambiguous, whereas re-deriving
    Spark's exact escape charset would be a fragile reimplementation."""
    out: list[str] = []
    i = 0
    while i < len(name):
        c = name[i]
        if c == "%" and i + 3 <= len(name):
            try:
                out.append(chr(int(name[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def list_partition_values(spark: SparkSession, path: str, key: str) -> dict[str, str]:
    """Map of partition VALUE -> directory name under a partitioned
    dataset root (e.g. {"vector": "term=vector"}). One driver-side
    listStatus — the same O(#partitions) metadata pass partition
    discovery performs on every read of the dataset."""
    fs, hpath = _hadoop_fs(spark, path)
    prefix = f"{key}="
    out: dict[str, str] = {}
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
            out[_unescape_partition_value(name[len(prefix) :])] = name
    return out


def _delete_partition_dirs(
    spark: SparkSession, path: str, key: str, values: set[str]
) -> None:
    """Remove the partition directories for ``values`` (post-delete
    EMPTIED partitions, which dynamic overwrite cannot touch because no
    rows are written into them)."""
    if not values:
        return
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark._jvm
    dirs = list_partition_values(spark, path, key)
    for v in values:
        name = dirs.get(v)
        if name is not None:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{name}"), True)


def _swap_directory(spark: SparkSession, old_path: str, new_path: str) -> None:
    """Three-step swap: rename(old -> old_retired), rename(new -> old),
    delete(old_retired) — the commit step of the write-new-then-swap
    compaction. The retire-first order means the previous layout is never
    DELETED before its replacement is in place: a failure between the two
    renames leaves the data recoverable at ``<old>_retired`` (and the
    next compaction clears a stale retiree). Still not transactional —
    single-writer contract, concurrent readers race the renames
    (documented in the module docstring); a real table format would
    commit a manifest instead."""
    fs, old = _hadoop_fs(spark, old_path)
    jvm = spark._jvm
    new = jvm.org.apache.hadoop.fs.Path(new_path)
    retired = jvm.org.apache.hadoop.fs.Path(f"{old_path}_retired")
    fs.delete(retired, True)  # clear a stale retiree from a failed swap
    if not fs.rename(old, retired):
        raise IOError(f"compaction swap failed: retire {old_path}")
    if not fs.rename(new, old):
        # put the old layout back so the live path never dangles
        fs.rename(retired, old)
        raise IOError(f"compaction swap failed: rename {new_path} -> {old_path}")
    fs.delete(retired, True)


# --- BM25 inverted-index maintenance ------------------------------------------


# above this many affected terms the rewrite switches from a partition-
# pruned isin literal to a term semi-join: a driver-side list of 10^5+
# terms would bloat the plan (and its collect), while the semi-join keeps
# the term set distributed at the cost of an unpruned second scan — the
# standard literal-vs-join pushdown crossover
_ISIN_MAX_TERMS = 10_000


def delete_bm25_docs(
    spark: SparkSession,
    path: str,
    deleted: DataFrame,
    id_col: str = "doc_id",
    write_partitions: int = 32,
    isin_max_terms: int = _ISIN_MAX_TERMS,
) -> None:
    """Copy-on-write DELETE from a ``write_bm25_index`` layout (the
    right-to-be-forgotten path a GDPR erasure demands of a persisted
    index, completing the CREATE/APPEND lifecycle):

    1. ONE map-only scan of the postings locates victim rows via a
       broadcast semi-join on the (distinct) deleted ids — the inverted
       index is keyed by term, so finding a document's postings
       inherently reads the postings once (the same full-scan cost a
       Delta/Iceberg copy-on-write DELETE without a locating index pays).
       The victim set is localCheckpointed: it is small (the deleted
       docs' postings) and feeds three consumers (affected terms, the
       stats delta, the emptied-term check).
    2. Only AFFECTED term partitions are rewritten (survivor rows of
       those terms, dynamic partition overwrite); unaffected term
       directories — the overwhelming majority for a bounded delete
       batch — are never touched.
    3. Term partitions whose every posting was deleted are removed via
       the filesystem (dynamic overwrite writes no data there, so the
       stale directory must be dropped explicitly).
    4. The 1-row stats table is replaced with exact decremented totals:
       n_docs/sum_dl are plain sums, and per-term df is never stored (it
       derives from postings), so the delete cannot stale it — the same
       mergeable-constants argument as append_bm25_batch, run backwards.

    Deleted ids ABSENT from the postings are treated as never-ingested
    (no-op, which also makes the delete idempotent). The deleted-id set
    is broadcast: erasure batches are bounded by contract (they arrive
    as requests, not as a corpus slice) — a delete large enough to break
    a broadcast is cheaper served as a filtered REBUILD, the same
    crossover every lakehouse DELETE has. CAVEAT: a document
    ingested with ZERO tokens has no postings and therefore cannot be
    located in a postings-only layout — its n_docs contribution would
    survive an attempted delete. Corpora admitting empty documents need
    a (doc_id, dl) sidecar; the gate corpus has none (every document
    tokenizes to >= 1 term), and the limitation is inherent to inverted
    postings, not this implementation (Lucene tracks live-docs bitmaps
    for the same reason)."""
    del_ids = deleted.select(F.col(id_col).alias("doc_id")).distinct()
    post = spark.read.parquet(f"{path}/postings")
    victims = post.join(F.broadcast(del_ids), "doc_id", "semi").localCheckpoint()

    aff_terms = victims.select("term").distinct().localCheckpoint()
    # peek one past the isin crossover instead of collecting the full set:
    # the affected-term LIST only ever reaches the driver when it is small
    # enough to splice as a partition-pruning literal
    head = [r["term"] for r in aff_terms.limit(isin_max_terms + 1).collect()]
    if not head:
        return
    # stats delta: one row per deleted doc (dl is denormalized into every
    # posting of the doc; first() over identical values)
    delta = (
        victims.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_del"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("dl_del"),
        )
        .collect()[0]
    )

    if len(head) <= isin_max_terms:
        # small erasure vocabulary: literal filter → parquet partition
        # pruning, the scan touches only affected directories
        affected_posts = post.filter(F.col("term").isin(head))
        n_parts = max(min(write_partitions, len(head)), 1)
    else:
        # huge erasure vocabulary: keep the term set distributed (a 10^5+
        # element isin literal bloats the plan and the driver); costs one
        # unpruned re-scan, still ≪ a rebuild which re-tokenizes the corpus
        affected_posts = post.join(aff_terms, "term", "semi")
        n_parts = write_partitions
    # localCheckpoint before the rewrite: (a) Spark refuses to overwrite a
    # path its plan still reads from — the checkpoint cuts that lineage
    # (the rewrite materializes exactly this data anyway; at 100 TB a
    # too-large affected set would write-new-then-swap instead, as the
    # compactor does); (b) the frame feeds two consumers (surviving-term
    # set + the write)
    surv = (
        affected_posts.join(F.broadcast(del_ids), "doc_id", "anti")
        .localCheckpoint()
    )
    # a term dir left with zero survivors gets NO rows in the dynamic
    # overwrite — those dirs must be dropped explicitly; the emptied set
    # is computed DISTRIBUTED (affected anti surviving) and only it is
    # collected — bounded by terms that lost their every posting
    emptied = {
        r["term"]
        for r in aff_terms.join(
            surv.select("term").distinct(), "term", "anti"
        ).collect()
    }
    surv.repartition(n_parts, "term").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("term").parquet(f"{path}/postings")
    _delete_partition_dirs(spark, f"{path}/postings", "term", emptied)

    old = spark.read.parquet(f"{path}/stats").collect()[0]
    spark.createDataFrame(
        [(old["n_docs"] - delta["n_del"], old["sum_dl"] - delta["dl_del"])],
        "n_docs long, sum_dl long",
    ).write.mode("overwrite").parquet(f"{path}/stats")


def compact_bm25_postings(
    spark: SparkSession, path: str, write_partitions: int = 32
) -> None:
    """Compact a ``write_bm25_index`` postings layout back to one
    right-sized file per term directory. Every ``append_bm25_batch``
    leaves one file per batch per touched term dir (and a delete's
    rewrite adds its own) — the classic small-file accumulation that
    degrades scan planning at scale; compaction is the Lucene segment
    merge / lakehouse OPTIMIZE analog.

    Shape: read postings, repartition on term with a PINNED count (the
    write_ivf_corpus AQE-coalesce lesson), write into a sibling
    ``postings_compacting`` directory, then swap it in. Writing new
    files FIRST means the job never overwrites data it is still reading
    (Spark cannot overwrite a path being scanned) and a mid-compaction
    failure leaves the live layout intact — only the swap is the commit
    point. Stats are untouched: compaction is row-preserving by
    construction, and the probe-equivalence gate
    (bm25_compact_probe_equiv) proves it."""
    post = spark.read.parquet(f"{path}/postings")
    tmp = f"{path}/postings_compacting"
    post.repartition(write_partitions, "term").write.mode("overwrite").partitionBy(
        "term"
    ).parquet(tmp)
    _swap_directory(spark, f"{path}/postings", tmp)


# --- IVF corpus maintenance ----------------------------------------------------


def delete_ivf_vecs(
    spark: SparkSession,
    path: str,
    deleted: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """Copy-on-write DELETE from a ``write_ivf_corpus`` layout: one scan
    locates the victims' centroid lists (broadcast semi-join — the IVF
    corpus is keyed by cid, so the deleted ids' lists are not known
    up front), then ONLY the affected cid directories are rewritten
    without the victims (dynamic partition overwrite); lists emptied
    entirely are dropped through the filesystem. Centroids are NOT
    retrained — the caller keeps serving with the same trained list,
    exactly as appends do (re-clustering after heavy churn is an offline
    rebuild, per append_ivf_batch's contract). Unknown ids are a no-op
    and the operation is idempotent. Gate: ivf_delete_probe_equiv —
    probing the maintained layout hash-matches the IVF oracle over the
    surviving corpus with the SAME centroids."""
    del_ids = deleted.select(F.col(id_col).alias(id_col)).distinct()
    corpus = spark.read.parquet(path)
    victims = corpus.join(F.broadcast(del_ids), id_col, "semi")
    affected = {r["cid"] for r in victims.select("cid").distinct().collect()}
    if not affected:
        return
    # checkpoint for the same two reasons as delete_bm25_docs: cut the
    # read-path lineage before the in-place rewrite, and feed the
    # surviving-cid probe + the write from one materialization
    surv = (
        corpus.filter(F.col("cid").isin(list(affected)))
        .join(F.broadcast(del_ids), id_col, "anti")
        .localCheckpoint()
    )
    surviving = {r["cid"] for r in surv.select("cid").distinct().collect()}
    surv.repartition(max(len(affected), 1), "cid").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("cid").parquet(path)
    _delete_partition_dirs(
        spark, path, "cid", {str(c) for c in affected - surviving}
    )


def compact_ivf_corpus(
    spark: SparkSession, path: str, n_lists: int
) -> None:
    """Compact a ``write_ivf_corpus`` layout to one file per cid list
    (appends fragment the lists one file per batch). Same
    write-new-then-swap shape as compact_bm25_postings; ``n_lists`` pins
    the shuffle count (= len(centroids) at gate scale; K·n_lists for
    K-way write parallelism per list at 100 TB, per write_ivf_corpus)."""
    corpus = spark.read.parquet(path)
    tmp = f"{path}_compacting"
    corpus.repartition(n_lists, "cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(tmp)
    _swap_directory(spark, path, tmp)
