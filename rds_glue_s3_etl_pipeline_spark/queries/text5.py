"""Fifth text batch — exact-substring (repeated-span) deduplication,
the Lee et al. 2021 "Deduplicating Training Data Makes Language Models
Better" operator family: find maximal duplicated token spans across the
corpus (q170) and scrub every non-first occurrence out of the training
text (q171).

Chunk-level dedup (q115) works on FIXED non-overlapping 8-token blocks,
so a duplicated passage that straddles a chunk boundary is invisible to
it. These queries slide the window at stride 1, so any duplicated run
of >= W tokens is caught regardless of alignment, and adjacent
duplicated windows are merged into maximal spans (gaps-and-islands).

100 TB shape
------------
* One explode produces ~n_tokens window rows per doc; every downstream
  shuffle is keyed on the fixed-width md5 of the window text (16
  bytes), never the text itself, so shuffle volume is bounded by token
  count x 16B, not token count x window width. md5 collisions are
  negligible even at 1e12 windows (birthday bound ~n^2/2^129 ~ 1e-15)
  and a collision only over-marks a span — use a 256-bit hash if even
  that is unacceptable.
* The occurrence-count aggregate is a partial (map-side) hash agg; the
  dup-mark join is a shuffle join on the hash. A boilerplate window
  repeated millions of times is a hot key — AQE skew-join splitting
  handles it (enabled session-wide), and the df-cap pattern of
  operators/dedup.py (drop windows above a document-frequency ceiling,
  they carry no dedup signal) is the explicit escape hatch.
* Island merging and span stats are window functions partitioned by
  doc_id — per-partition work is bounded by document length, never by
  corpus size.

Reference parity: the reference pipeline (gule_test_job.py) has no
sub-document dedup; these are EXT operators from the LLM-pipeline
north star (SURVEY.md §2.11, Dedup family).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as X
from .registry import query

# Window width in tokens. 8 keeps parity with q115's chunk size; real
# pipelines use 50 (Lee et al.) — the plan shape is identical.
_W = 8

# Shared CTE: every stride-1 window of _W tokens, keyed by md5.
_WIN_CTE = f"""
tok AS (
  SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS toks FROM documents
),
win AS (
  SELECT doc_id, CAST(i AS BIGINT) AS s, md5(array_to_string(toks[i+1:i+{_W}], ' ')) AS h
  FROM tok, unnest(generate_series(0, len(toks)-{_W})) AS t(i)
)
"""


def _windows(spark, sf_dir):
    """(doc_id, toks, n_tokens) and the stride-1 window table
    (doc_id, s, h) with h = md5 of the W-token window text."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        X.tokens("text").alias("toks"),
    ).withColumn("n_tokens", F.size("toks").cast("long"))
    win = (
        tok.filter(F.col("n_tokens") >= _W)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(size(toks) - {_W} as int)),"
                    f" i -> md5(cast(array_join(slice(toks, i + 1, {_W}), ' ') as binary)))"
                )
            ).alias("s", "h"),
        )
        .withColumn("s", F.col("s").cast("long"))
    )
    return tok, win


_Q170_ORACLE = f"""
WITH {_WIN_CTE},
duph AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
marked AS (SELECT doc_id, s FROM win JOIN duph USING (h)),
isl AS (
  SELECT doc_id, s,
         CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY s) IS NULL
                OR s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) > {_W}
              THEN 1 ELSE 0 END AS new_isl
  FROM marked
),
isl2 AS (
  SELECT doc_id, s,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
  FROM isl
),
spans AS (
  SELECT doc_id, isl_id, MIN(s) AS a, MAX(s) + {_W} - 1 AS b
  FROM isl2 GROUP BY doc_id, isl_id
)
SELECT sp.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(b - a + 1) AS BIGINT) AS dup_tokens,
       CAST(MAX(b - a + 1) AS BIGINT) AS longest_span,
       CAST(ANY_VALUE(len(t.toks)) AS BIGINT) AS n_tokens,
       CAST(SUM(b - a + 1) AS DOUBLE) / ANY_VALUE(len(t.toks)) AS dup_frac
FROM spans sp JOIN tok t ON sp.doc_id = t.doc_id
GROUP BY sp.doc_id
"""


@query("q170_repeated_spans", oracle=_Q170_ORACLE, tags=("text", "dedup", "EXT"))
def q170_repeated_spans(spark, sf_dir):
    """Maximal duplicated token spans per document (exact-substring
    dedup signal, Lee et al. 2021 shape): every stride-1 window of W
    tokens whose md5 occurs more than once anywhere in the corpus is a
    duplicated window; per doc, runs of duplicated windows with start
    gaps <= W merge into maximal spans (fixed W makes window ends
    monotone in starts, so a lag() gap test is the whole
    gaps-and-islands machinery). Output: span count, duplicated token
    coverage, longest span, and coverage fraction — the report a
    corpus team reads before deciding the scrub threshold."""
    tok, win = _windows(spark, sf_dir)
    # Dup detection is a COUNT WINDOW over h — one shuffle, one pass
    # over the window table. The groupBy(h)->join-back alternative
    # recomputes and reshuffles the window table for each side (2.36M
    # windows x 2 passes measured 78s vs 4s for this shape at the 10x
    # probe). Cost: a corpus-wide boilerplate hash is one window
    # partition (no AQE skew split) — max multiplicity on the probe
    # fixture is 4; hot-hash corpora take the df-cap escape hatch
    # documented in the module header.
    w_h = Window.partitionBy("h")
    marked = (
        win.withColumn("c", F.count(F.lit(1)).over(w_h))
        .filter(F.col("c") > 1)
        .select("doc_id", "s")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("s")
    prev = F.lag("s").over(w_doc)
    isl = marked.withColumn(
        "new_isl",
        F.when(prev.isNull() | (F.col("s") - prev > _W), 1).otherwise(0),
    ).withColumn(
        "isl_id",
        F.sum("new_isl").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = isl.groupBy("doc_id", "isl_id").agg(
        F.min("s").alias("a"), (F.max("s") + _W - 1).alias("b")
    )
    span_len = F.col("b") - F.col("a") + 1
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(span_len).alias("dup_tokens"),
        F.max(span_len).alias("longest_span"),
    )
    return per_doc.join(tok.select("doc_id", "n_tokens"), "doc_id").select(
        "doc_id",
        "n_dup_spans",
        "dup_tokens",
        "longest_span",
        "n_tokens",
        (F.col("dup_tokens").cast("double") / F.col("n_tokens")).alias("dup_frac"),
    )


_Q171_ORACLE = f"""
WITH {_WIN_CTE},
occ AS (
  SELECT doc_id, s,
         COUNT(*) OVER (PARTITION BY h) AS c,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
  FROM win
),
cut AS (SELECT doc_id, s FROM occ WHERE c > 1 AND rn > 1),
cutpos AS (
  SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
  FROM cut, unnest(generate_series(s, s + {_W} - 1)) AS g(p)
),
allpos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i+1] AS tok
  FROM tok, unnest(generate_series(0, len(toks)-1)) AS t(i)
),
kept AS (
  SELECT a.doc_id, a.pos, a.tok
  FROM allpos a LEFT JOIN cutpos c ON a.doc_id = c.doc_id AND a.pos = c.pos
  WHERE c.doc_id IS NULL
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(k.fp, md5('')) AS scrub_fp
FROM tok t
LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
  FROM kept GROUP BY doc_id
) k ON t.doc_id = k.doc_id
"""


@query("q171_span_scrub", oracle=_Q171_ORACLE, tags=("text", "dedup", "EXT"))
def q171_span_scrub(spark, sf_dir):
    """Keep-first exact-substring scrub (what Lee et al. actually DO
    with the spans q170 reports): for every duplicated window, the
    globally first occurrence (min (doc_id, start)) survives; the
    tokens covered by every other occurrence are deleted from the
    training text. Output fingerprints the scrubbed text, proving the
    rewrite itself matches the oracle, not just the counts.

    The occurrence ranking is one ROW_NUMBER over the window hash; the
    cut positions are an explode of at most W rows per cut window,
    deduplicated per doc; the rebuild is a per-doc sort-free
    array_sort(collect_list(struct(pos, tok))) — all partitioned by
    doc_id, so per-task state is one document, never the corpus."""
    tok, win = _windows(spark, sf_dir)
    w_h = Window.partitionBy("h")
    w_h_ord = w_h.orderBy("doc_id", "s")
    occ = win.select(
        "doc_id",
        "s",
        F.count(F.lit(1)).over(w_h).alias("c"),
        F.row_number().over(w_h_ord).alias("rn"),
    )
    cut = occ.filter((F.col("c") > 1) & (F.col("rn") > 1)).select("doc_id", "s")
    cutpos = cut.select(
        "doc_id", F.explode(F.sequence(F.col("s"), F.col("s") + _W - 1)).alias("pos")
    ).distinct()
    allpos = tok.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("long"))
    kept = allpos.join(cutpos, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda st: st["tok"],
                ),
                " ",
            ).cast("binary")
        ).alias("fp"),
    )
    empty_fp = F.md5(F.lit("").cast("binary"))
    return tok.select("doc_id", "n_tokens").join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("fp"), empty_fp).alias("scrub_fp"),
    )


# --------------------------------------------------------------------------
# q175: span-level eval decontamination — the reverse direction of
# q78 (which scores EVAL docs against the corpus): flag TRAINING docs
# that share any exact W-token window with the held-out benchmark
# slice, so they can be dropped before training. The fixture's 'src0'
# source stands in for the benchmark set (the operator is a join shape
# — any eval table plugs in).
# --------------------------------------------------------------------------

_EVAL_SOURCE = "src0"

_Q175_ORACLE = f"""
WITH {_WIN_CTE},
src AS (SELECT doc_id, source FROM documents),
winsrc AS (SELECT w.doc_id, w.s, w.h, src.source FROM win w JOIN src USING (doc_id)),
eval_h AS (SELECT DISTINCT h FROM winsrc WHERE source = '{_EVAL_SOURCE}'),
train AS (SELECT * FROM winsrc WHERE source <> '{_EVAL_SOURCE}'),
hits AS (
  SELECT t.doc_id, CAST(COUNT(DISTINCT t.h) AS BIGINT) AS n_shared_windows
  FROM train t JOIN eval_h e USING (h)
  GROUP BY t.doc_id
),
perdoc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows FROM train GROUP BY doc_id
)
SELECT hits.doc_id, n_shared_windows, n_windows,
       n_shared_windows / CAST(n_windows AS DOUBLE) AS contamination_frac
FROM hits JOIN perdoc USING (doc_id)
"""


@query("q175_eval_decontaminate", oracle=_Q175_ORACLE, tags=("text", "dedup", "EXT"))
def q175_eval_decontaminate(spark, sf_dir):
    """Training docs sharing >= 1 exact W-token window with the eval
    slice, with how much of each doc is contaminated (distinct shared
    window hashes / distinct windows). The eval window set is DISTINCT
    hashes — benchmark-sized, so the membership join broadcasts at any
    training-corpus scale; everything else is the q170 window table."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    _, win = _windows(spark, sf_dir)
    winsrc = win.join(d, "doc_id")
    eval_h = (
        winsrc.filter(F.col("source") == _EVAL_SOURCE).select("h").distinct()
    )
    train = winsrc.filter(F.col("source") != _EVAL_SOURCE)
    hits = (
        train.join(F.broadcast(eval_h), "h")
        .groupBy("doc_id")
        .agg(F.count_distinct("h").alias("n_shared_windows"))
    )
    per_doc = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    return hits.join(per_doc, "doc_id").select(
        "doc_id",
        "n_shared_windows",
        "n_windows",
        (
            F.col("n_shared_windows") / F.col("n_windows").cast("double")
        ).alias("contamination_frac"),
    )


# --------------------------------------------------------------------------
# q180: template families — documents connected by SHARED EXACT SPANS
# (>= _MIN_SHARED distinct W-token windows) clustered into connected
# components. This is how boilerplate/mirror families surface in a
# crawl: MinHash families (q60/q108) need global document similarity,
# while a shared template header links docs whose bodies are disjoint.
# --------------------------------------------------------------------------

_MIN_SHARED = 3  # distinct shared windows to draw an edge
_MAX_DF = 64  # doc-frequency cap: hotter windows are boilerplate noise

_Q180_ORACLE = f"""
WITH RECURSIVE {_WIN_CTE},
occ AS (SELECT DISTINCT h, doc_id FROM win),
hh AS (
  SELECT h FROM occ GROUP BY h
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {_MAX_DF}
),
p0 AS (
  SELECT o1.doc_id AS a, o2.doc_id AS b
  FROM occ o1 JOIN occ o2 USING (h) JOIN hh USING (h)
  WHERE o1.doc_id < o2.doc_id
),
edges AS (
  SELECT a, b FROM (SELECT a, b, COUNT(*) AS c FROM p0 GROUP BY a, b)
  WHERE c >= {_MIN_SHARED}
),
sym AS (
  SELECT a, b FROM edges UNION SELECT b, a FROM edges
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
lab AS (
  SELECT a AS doc_id, LEAST(MIN(b), a) AS family_id FROM reach GROUP BY a
)
SELECT doc_id, family_id,
       CAST(COUNT(*) OVER (PARTITION BY family_id) AS BIGINT) AS family_size
FROM lab
"""


@query("q180_template_families", oracle=_Q180_ORACLE, tags=("text", "dedup", "graph", "EXT"))
def q180_template_families(spark, sf_dir):
    """Shared-span document graph → families: distinct (window, doc)
    occurrences grouped per hash (df-capped — a window hotter than
    _MAX_DF docs is boilerplate, not family signal, and its pair
    fan-out is C(df,2)), in-array pair expansion (no self-join — the
    window table is computed ONCE), edges at >= _MIN_SHARED shared
    windows, then star-contraction components (round count O(log^2 n),
    diameter-free). Family size rides a count window on the label."""
    from ..operators.graph import connected_components_star

    _, win = _windows(spark, sf_dir)
    occ = win.select("h", "doc_id").distinct()
    grouped = (
        occ.groupBy("h")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= _MAX_DF))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds)), y ->"
                " struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    edges = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _MIN_SHARED)
        .select("a", "b")
    )
    lab = connected_components_star(edges, src="a", dst="b").select(
        F.col("id").alias("doc_id"), F.col("cluster_id").alias("family_id")
    )
    w_fam = Window.partitionBy("family_id")
    return lab.withColumn(
        "family_size", F.count(F.lit(1)).over(w_fam).cast("long")
    )


# --------------------------------------------------------------------------
# q181: agreement gate between the two dedup signals — exact-span
# coverage (q170, dup_frac >= 0.8) vs MinHash keep-best clustering
# (q124 non-survivors). The honest-measurement pattern of the recall
# gates (q145/q155/q158): when two independent operators claim "this
# doc is a duplicate", report where they agree and where only one
# fires, as numbers, not prose.
# --------------------------------------------------------------------------

_SPAN_DUP_FRAC = 0.8


def _q181_oracle() -> str:
    from .events3 import _Q124_ORACLE

    return f"""
WITH span AS (
  SELECT doc_id FROM ({_Q170_ORACLE}) WHERE dup_frac >= {_SPAN_DUP_FRAC}
),
kept AS (SELECT kept_doc_id FROM ({_Q124_ORACLE})),
dropped AS (
  SELECT d.doc_id FROM documents d
  LEFT JOIN kept k ON d.doc_id = k.kept_doc_id
  WHERE k.kept_doc_id IS NULL
),
m AS (
  SELECT (SELECT COUNT(*) FROM span) AS a,
         (SELECT COUNT(*) FROM dropped) AS b,
         (SELECT COUNT(*) FROM span JOIN dropped USING (doc_id)) AS c
)
SELECT CAST(a AS BIGINT) AS n_span_flagged,
       CAST(b AS BIGINT) AS n_minhash_dropped,
       CAST(c AS BIGINT) AS n_both,
       CAST(a - c AS BIGINT) AS n_span_only,
       CAST(b - c AS BIGINT) AS n_minhash_only,
       c / CAST(a + b - c AS DOUBLE) AS jaccard
FROM m
"""


@query("q181_dedup_agreement", oracle=_q181_oracle(), tags=("dedup", "gate", "EXT"))
def q181_dedup_agreement(spark, sf_dir):
    """One-row agreement report: docs the span detector calls
    mostly-duplicate (coverage >= 0.8) vs docs the MinHash keep-best
    pass drops, their overlap, and the Jaccard of the two duplicate
    sets. Three count aggregates cross-joined — nothing collects; both
    inputs are the already-verified operators, composed."""
    from ..operators.par import run_concurrently
    from .events3 import q124_dedup_keep_best

    # The two detectors are independent pipelines (the MinHash arm runs
    # an eager CC loop); overlap them on driver threads (par.py).
    span, kept = run_concurrently(
        lambda: q170_repeated_spans(spark, sf_dir)
        .filter(F.col("dup_frac") >= _SPAN_DUP_FRAC)
        .select("doc_id"),
        lambda: q124_dedup_keep_best(spark, sf_dir).select(
            F.col("kept_doc_id").alias("doc_id")
        ),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dropped = docs.join(kept, "doc_id", "left_anti")
    a = span.agg(F.count(F.lit(1)).alias("a"))
    b = dropped.agg(F.count(F.lit(1)).alias("b"))
    c = span.join(dropped, "doc_id").agg(F.count(F.lit(1)).alias("c"))
    return (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            F.col("a").alias("n_span_flagged"),
            F.col("b").alias("n_minhash_dropped"),
            F.col("c").alias("n_both"),
            (F.col("a") - F.col("c")).alias("n_span_only"),
            (F.col("b") - F.col("c")).alias("n_minhash_only"),
            (
                F.col("c") / (F.col("a") + F.col("b") - F.col("c")).cast("double")
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# q218: containment decontamination — the ASYMMETRIC overlap measure.
# Jaccard (q23) misses an eval sample embedded in a long train doc
# (the union term swamps it); containment |ngrams(eval) ∩
# ngrams(train)| / |ngrams(eval)| is exactly the "is this benchmark
# item inside that training document" question (the n-gram-overlap
# decontamination rule of GPT-3 appendix C / PaLM-style reports).
# --------------------------------------------------------------------------

_CONT_N = 3            # word-trigram shingles (eval items are short)
_CONT_THRESHOLD = 0.2  # flag train docs containing >= 20% of the item
_CONT_DF_CAP = 64      # candidate stage drops train shingles above this df

# Shared oracle CTEs: word-trigram shingle sets split into eval/train
# sides plus per-eval-doc sizes — the base of q218 and its q231 gate.
_CONT_CTES = f"""toks AS (
  SELECT doc_id, source, regexp_split_to_array(TRIM(text), '\\s+') AS t
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, source, sh FROM (
    SELECT doc_id, source,
           array_to_string(t[i:i+{_CONT_N - 1}], ' ') AS sh
    FROM (SELECT doc_id, source, t,
                 unnest(generate_series(1, GREATEST(array_length(t) - {_CONT_N - 1}, 0))) AS i
          FROM toks)
  )
),
ev AS (SELECT doc_id, sh FROM shingles WHERE source = '{_EVAL_SOURCE}'),
tr AS (SELECT doc_id, sh FROM shingles WHERE source <> '{_EVAL_SOURCE}'),
evsz AS (SELECT doc_id, COUNT(*) AS n FROM ev GROUP BY doc_id)"""

_Q218_ORACLE = f"""
WITH {_CONT_CTES},
flagged AS (
  SELECT i.eval_doc, i.train_doc,
         i.n_common / CAST(s.n AS DOUBLE) AS containment
  FROM (
    SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc, COUNT(*) AS n_common
    FROM ev e JOIN tr t ON e.sh = t.sh
    GROUP BY e.doc_id, t.doc_id
  ) i
  JOIN evsz s ON i.eval_doc = s.doc_id
  WHERE i.n_common / CAST(s.n AS DOUBLE) >= {_CONT_THRESHOLD}
),
agg AS (
  SELECT eval_doc, CAST(COUNT(*) AS BIGINT) AS n_flagged,
         MAX(containment) AS max_containment
  FROM flagged GROUP BY eval_doc
),
best AS (
  SELECT eval_doc, train_doc AS best_train_doc FROM (
    SELECT eval_doc, train_doc, ROW_NUMBER() OVER (
      PARTITION BY eval_doc ORDER BY containment DESC, train_doc) AS rn
    FROM flagged
  ) WHERE rn = 1
)
SELECT d.doc_id AS eval_doc,
       COALESCE(agg.n_flagged, 0) AS n_flagged,
       COALESCE(agg.max_containment, 0.0) AS max_containment,
       best.best_train_doc
FROM documents d
LEFT JOIN agg ON d.doc_id = agg.eval_doc
LEFT JOIN best ON d.doc_id = best.eval_doc
WHERE d.source = '{_EVAL_SOURCE}'
"""


def _cont_frames(spark, sf_dir):
    """(docs, ev, tr, evsz) of the containment pipeline: distinct
    word-trigram shingles per doc (xxhash64 keys), split into the
    eval side (doc_id aliased eval_doc) and train side (train_doc),
    plus per-eval-doc shingle counts. Shared by q218 and its q231
    recall gate — one shingle pass, two consumers."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    sh = (
        X.exploded_word_shingles(d, "text", "doc_id", _CONT_N)
        .select("doc_id", F.xxhash64("sh").alias("h"))
        .distinct()
        .join(d.select("doc_id", "source"), "doc_id")
    )
    is_eval = F.col("source") == _EVAL_SOURCE
    ev = sh.filter(is_eval).select(F.col("doc_id").alias("eval_doc"), "h")
    tr = sh.filter(~is_eval).select(F.col("doc_id").alias("train_doc"), "h")
    evsz = ev.groupBy("eval_doc").agg(F.count(F.lit(1)).alias("n"))
    return d, ev, tr, evsz


@query(
    "q218_containment_decontaminate",
    oracle=_Q218_ORACLE,
    tags=("text", "dedup", "EXT"),
)
def q218_containment_decontaminate(spark, sf_dir):
    """Per-benchmark-item contamination report: for every eval doc, how
    many train docs contain >= 20% of its word trigrams, the max
    containment, and the worst offender (ties -> lowest doc_id). Every
    eval doc gets a row — clean items report (0, 0.0, NULL).

    Staged like the dedup path: the candidate join is driven from the
    df-capped side (train shingles in > _CONT_DF_CAP docs carry no
    identification signal and are dropped BEFORE the fanout join —
    boilerplate trigrams are the hot keys at corpus scale), then the
    exact intersection count runs per CANDIDATE PAIR over the full
    shingle sets, so the flagged containment values are exact. The
    oracle computes the uncapped all-pairs form — the hash match at the
    fixture is the staged-recall proof, same contract as q108's.

    Scale: eval-side shingles are benchmark-bounded (broadcast); pair
    work is linear in candidates x eval-item length, never train x
    train. Shuffle keys are 8-byte xxhash64 of the shingles.

    Reference scope: EXT (SURVEY §2.11 corpus building / dedup).
    """
    d, ev, tr, evsz = _cont_frames(spark, sf_dir)
    rare = (
        tr.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _CONT_DF_CAP)
        .select("h")
    )
    cand = (
        ev.join(rare, "h").join(tr, "h").select("eval_doc", "train_doc").distinct()
    )
    inter = (
        cand.join(ev, "eval_doc")
        .join(tr, ["train_doc", "h"])
        .groupBy("eval_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    flagged = (
        inter.join(evsz, "eval_doc")
        .withColumn(
            "containment", F.col("n_common") / F.col("n").cast("double")
        )
        .filter(F.col("containment") >= _CONT_THRESHOLD)
    )
    w = Window.partitionBy("eval_doc").orderBy(
        F.col("containment").desc(), F.col("train_doc").asc()
    )
    best = (
        flagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("eval_doc", F.col("train_doc").alias("best_train_doc"))
    )
    agg = flagged.groupBy("eval_doc").agg(
        F.count(F.lit(1)).alias("n_flagged"),
        F.max("containment").alias("max_containment"),
    )
    evdocs = d.filter(F.col("source") == _EVAL_SOURCE).select(
        F.col("doc_id").alias("eval_doc")
    )
    return (
        evdocs.join(agg, "eval_doc", "left")
        .join(best, "eval_doc", "left")
        .select(
            "eval_doc",
            F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
            F.coalesce("max_containment", F.lit(0.0)).alias("max_containment"),
            "best_train_doc",
        )
    )


# --------------------------------------------------------------------------
# q231: the containment recall gate (round-9 ADVICE). q218's candidate
# stage drops train shingles with df > _CONT_DF_CAP; a contaminated
# eval item whose shared trigrams are ALL high-df boilerplate is then
# invisible to the capped form while the (uncapped) oracle sees it —
# the fixture hash match proves recall only at fixture df
# distributions. This gate MEASURES the cap's recall on a bounded
# eval-doc sample, the q213 pattern: exact arm = uncapped pairs for
# the sample (sample x corpus, linear), capped arm = q218's candidate
# stage for the same sample.
# --------------------------------------------------------------------------

_CONT_SAMPLE = 32
_CONT_RECALL_MIN = 0.9


def _q231_oracle() -> str:
    return f"""
WITH {_CONT_CTES},
q AS (
  SELECT doc_id FROM documents WHERE source = '{_EVAL_SOURCE}'
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {_CONT_SAMPLE}
),
evq AS (SELECT e.doc_id, e.sh FROM ev e JOIN q ON e.doc_id = q.doc_id),
exact AS (
  SELECT i.eval_doc, i.train_doc
  FROM (
    SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc, COUNT(*) AS n_common
    FROM evq e JOIN tr t ON e.sh = t.sh
    GROUP BY e.doc_id, t.doc_id
  ) i
  JOIN evsz s ON i.eval_doc = s.doc_id
  WHERE i.n_common / CAST(s.n AS DOUBLE) >= {_CONT_THRESHOLD}
),
rare AS (SELECT sh FROM tr GROUP BY sh HAVING COUNT(*) <= {_CONT_DF_CAP}),
cand AS (
  SELECT DISTINCT e.doc_id AS eval_doc, t.doc_id AS train_doc
  FROM evq e JOIN rare r ON e.sh = r.sh JOIN tr t ON t.sh = e.sh
),
capped AS (
  SELECT i.eval_doc, i.train_doc
  FROM (
    SELECT c.eval_doc, c.train_doc, COUNT(*) AS n_common
    FROM cand c
    JOIN evq e ON e.doc_id = c.eval_doc
    JOIN tr t ON t.doc_id = c.train_doc AND t.sh = e.sh
    GROUP BY c.eval_doc, c.train_doc
  ) i
  JOIN evsz s ON i.eval_doc = s.doc_id
  WHERE i.n_common / CAST(s.n AS DOUBLE) >= {_CONT_THRESHOLD}
),
m AS (
  SELECT CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS n_eval_sample,
         CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_flagged_exact,
         CAST((SELECT COUNT(*) FROM capped) AS BIGINT) AS n_flagged_capped,
         CAST((SELECT COUNT(*) FROM exact e JOIN capped c
               ON e.eval_doc = c.eval_doc AND e.train_doc = c.train_doc)
              AS BIGINT) AS n_hits
)
SELECT n_eval_sample, n_flagged_exact, n_flagged_capped, n_hits,
       CASE WHEN n_flagged_exact = 0 THEN 1.0
            ELSE n_hits / CAST(n_flagged_exact AS DOUBLE) END AS recall,
       CASE WHEN (CASE WHEN n_flagged_exact = 0 THEN 1.0
                       ELSE n_hits / CAST(n_flagged_exact AS DOUBLE) END)
                 >= {_CONT_RECALL_MIN}
            THEN 'ok' ELSE 'FAIL recall' END AS recall_gate
FROM m
"""


@query(
    "q231_containment_recall_gate",
    oracle=_q231_oracle(),
    tags=("text", "dedup", "gate", "EXT"),
)
def q231_containment_recall_gate(spark, sf_dir):
    """Recall of q218's df-capped candidate stage against the uncapped
    exact form on a deterministic md5-ordered sample of
    {_CONT_SAMPLE} eval docs: both arms compute the SAME exact
    containment per pair; they differ only in candidate generation
    (capped arm sees a pair only through a <= {_CONT_DF_CAP}-df shared
    trigram). recall = flagged pairs the capped form recovered /
    exact flagged pairs (1.0 when nothing is flagged), gated at
    {_CONT_RECALL_MIN}. At the fixture the cap does not bite (recall
    1.0 — the q218 hash match already implies it); the gate exists for
    LARGER df distributions, where boilerplate-only contamination is
    exactly the q218 docstring's blind spot.

    Scale: the exact arm is sample x corpus through the shingle join
    (eval docs are short; the sample is fixed-size), the capped arm is
    q218's machinery on the sample — both linear in the train corpus.
    """
    d, ev, tr, evsz = _cont_frames(spark, sf_dir)
    qs = (
        d.filter(F.col("source") == _EVAL_SOURCE)
        .orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
        )
        .limit(_CONT_SAMPLE)
        .select(F.col("doc_id").alias("eval_doc"))
    )
    evq = ev.join(F.broadcast(qs), "eval_doc")

    def _flagged(pairs_with_common):
        return (
            pairs_with_common.join(evsz, "eval_doc")
            .filter(
                F.col("n_common") / F.col("n").cast("double") >= _CONT_THRESHOLD
            )
            .select("eval_doc", "train_doc")
        )

    exact = _flagged(
        evq.join(tr, "h")
        .groupBy("eval_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    rare = (
        tr.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _CONT_DF_CAP)
        .select("h")
    )
    cand = (
        evq.join(rare, "h").join(tr, "h").select("eval_doc", "train_doc").distinct()
    )
    capped = _flagged(
        cand.join(evq, "eval_doc")
        .join(tr, ["train_doc", "h"])
        .groupBy("eval_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    n_sample = qs.agg(F.count(F.lit(1)).alias("n_eval_sample"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_flagged_exact"))
    n_capped = capped.agg(F.count(F.lit(1)).alias("n_flagged_capped"))
    n_hits = exact.join(capped, ["eval_doc", "train_doc"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    recall = F.when(F.col("n_flagged_exact") == 0, F.lit(1.0)).otherwise(
        F.col("n_hits") / F.col("n_flagged_exact").cast("double")
    )
    return (
        n_sample.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_capped))
        .crossJoin(F.broadcast(n_hits))
        .select(
            F.col("n_eval_sample").cast("long").alias("n_eval_sample"),
            F.col("n_flagged_exact").cast("long").alias("n_flagged_exact"),
            F.col("n_flagged_capped").cast("long").alias("n_flagged_capped"),
            F.col("n_hits").cast("long").alias("n_hits"),
            recall.alias("recall"),
            F.when(recall >= _CONT_RECALL_MIN, F.lit("ok"))
            .otherwise(F.lit("FAIL recall"))
            .alias("recall_gate"),
        )
    )
