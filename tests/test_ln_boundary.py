"""ln-site boundary diagnostic (r08 verdict item 4): every
``FLOOR(ln(x)*K + 0.5)`` grid the oracles HASH must keep its attained
fixture points far from a rounding boundary, so a cross-engine /
cross-libm ``ln`` divergence (the score_auc r07/r08 driver-env class)
fails loudly here as a named test instead of silently as a red
CORRECTNESS row.

Six hashed families, checked at BOTH fixture scales — sf0.001 (the
pytest scale) and sf0.01 (the scale the driver's differential oracle
actually runs at, which the pre-existing Spark-side margin tests in
``test_text_multimodal.py`` / ``test_runs_events.py`` never touched):

- DSIR micro grid (``text.py:_lp_micro``) — feeds
  dsir_importance_weights, score_calibration, score_auc(_parts);
  previously the ONLY hashed ln grid with no margin test anywhere.
- unigram-logprob nano grid (``text.py:unigram_logprob``) — also feeds
  perplexity_buckets and unigram_kl's r_nano side.
- drift nano grid (``events.py:psi_from_counts``) — feeds drift_psi and
  streaming_drift_psi (same constants, same counts frame).
- unigram-kl lr-micro grid (``text.py:unigram_kl``, r09 hardened form:
  the ln floors to integer micro BEFORE the p-weighting, so this grid
  is the query's ONLY engine-variant site).
- bm25 idf grid (``text.py:bm25_scores``) over the probe-query tokens.

Margin rule (error-relative, house form): a 1-ulp ln error moves the
scaled pre-floor value by at most ``|y| * 1.2e-16``; we assert every
attained point clears its nearest integer by > 1e4x that bound —
four orders of magnitude above the worst plausible libm spread.
Observed minima at HEAD (documented so a fixture re-materialization
that erodes them is visible in review): DSIR 2.6e6 ulp (sf0.001) /
2.6e7 (sf0.01); logprob ~4e7; drift 2.6e5 (sf0.001) / 4.4e6 (sf0.01).

Pure DuckDB + math — no SparkSession; the formulas mirror the oracle
SQL (which is the hashed side) with constants imported from the
operator modules so a constant change re-derives the grids.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from databricks_observe_spark.operators.events import (
    DRIFT_BIN_WIDTH,
    DRIFT_N_BINS,
    DRIFT_SPLIT_TS,
)
from databricks_observe_spark.operators.text import (
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
MARGIN_ULP = 1e4  # asserted floor; observed minima are 2.6e5+ (above)


def _assert_margins(ys: list[float], family: str) -> None:
    assert ys, family
    for y in ys:
        fr = y - math.floor(y)
        dist = min(fr, 1.0 - fr)
        err = max(abs(y) * 1.2e-16, 1e-12)
        assert dist > MARGIN_ULP * err, (family, y, dist, err)


@pytest.fixture(scope="module", params=SF_DIRS)
def con(request):
    c = duckdb.connect()
    for tbl in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{request.param}/{tbl}.parquet')"
        )
    yield c
    c.close()


def test_dsir_micro_grid_boundary_distance(con):
    rows = con.execute(
        f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
tfb AS (
  SELECT tf.tf, d.lang,
         CAST(('0x' || substr(md5(tf.tok), 1, 8))::BIGINT AS BIGINT)
           % {DSIR_BUCKETS} AS bucket
  FROM tf JOIN documents d ON tf.doc_id = d.doc_id
),
counts AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END)
              AS BIGINT) AS t_cnt,
         CAST(SUM(tf) AS BIGINT) AS r_cnt
  FROM tfb GROUP BY bucket
),
totals AS (SELECT CAST(SUM(t_cnt) AS DOUBLE) AS t_total,
                  CAST(SUM(r_cnt) AS DOUBLE) AS r_total FROM counts)
SELECT t_cnt, r_cnt, t_total, r_total FROM counts CROSS JOIN totals
"""
    ).fetchall()
    pts = set()
    for t_cnt, r_cnt, t_total, r_total in rows:
        den = float(DSIR_BUCKETS)
        pts.add(max(math.floor((t_cnt + 1) / (t_total + den) * 1e9 + 0.5), 1))
        pts.add(max(math.floor((r_cnt + 1) / (r_total + den) * 1e9 + 0.5), 1))
    _assert_margins([math.log(p / 1e9) * 1e6 + 0.5 for p in pts], "dsir")


def test_unigram_logprob_nano_grid_boundary_distance(con):
    rows = con.execute(
        """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
ctf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY tok),
tot AS (SELECT CAST(SUM(ctf) AS DOUBLE) AS total FROM ctf)
SELECT DISTINCT ctf, total FROM ctf CROSS JOIN tot
"""
    ).fetchall()
    pts = {max(math.floor(c / t * 1e9 + 0.5), 1) for c, t in rows}
    _assert_margins([math.log(p / 1e9) * 1e6 + 0.5 for p in pts], "logprob")


def test_drift_nano_grid_boundary_distance(con):
    rows = con.execute(
        f"""
WITH ev AS (
  SELECT event_type,
         LEAST(GREATEST(FLOOR(value / {DRIFT_BIN_WIDTH}), 0),
               {DRIFT_N_BINS - 1}) AS bin,
         CAST(ts < TIMESTAMP '{DRIFT_SPLIT_TS}' AS INT) AS is_ref
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT event_type, bin, CAST(SUM(is_ref) AS BIGINT) AS ref_n,
         CAST(SUM(1 - is_ref) AS BIGINT) AS cur_n
  FROM ev GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(SUM(ref_n) AS BIGINT) AS ref_total,
         CAST(SUM(cur_n) AS BIGINT) AS cur_total
  FROM counts GROUP BY event_type
),
grid AS (
  SELECT t.event_type, b.bin, t.ref_total, t.cur_total
  FROM totals t CROSS JOIN (
    SELECT unnest(generate_series(0, {DRIFT_N_BINS - 1})) AS bin) b
)
SELECT g.ref_total, g.cur_total, COALESCE(c.ref_n, 0), COALESCE(c.cur_n, 0)
FROM grid g LEFT JOIN counts c
  ON g.event_type = c.event_type AND g.bin = c.bin
"""
    ).fetchall()
    pts = set()
    for rt, ct, rn, cn in rows:
        pts.add(max(math.floor((rn + 1) / float(rt + DRIFT_N_BINS) * 1e9 + 0.5), 1))
        pts.add(max(math.floor((cn + 1) / float(ct + DRIFT_N_BINS) * 1e9 + 0.5), 1))
    _assert_margins([math.log(float(p)) * 1e6 + 0.5 for p in pts], "drift")


def test_unigram_kl_lr_micro_grid_boundary_distance(con):
    """The r09 hardening's load-bearing fact: kl's only engine-variant
    op is this ln grid (observed minima 2.5e5 ulp at sf0.001, 2e6 at
    sf0.01); the pre-r09 direct p*ln*1e12 floor measured a worst
    attained margin of only 1.66x the propagated error at sf0.01."""
    rows = con.execute(
        """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n FROM tf GROUP BY doc_id),
cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY tok),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tf)
SELECT DISTINCT tf.tf, n.n, cf.cf, tot.total
FROM tf JOIN n USING (doc_id) JOIN cf USING (tok) CROSS JOIN tot
"""
    ).fetchall()
    pts = set()
    for tf_, n_, cf_, total in rows:
        p = tf_ / n_
        pts.add(max(math.floor(p / (cf_ / total) * 1e9 + 0.5), 1))
    _assert_margins([math.log(p / 1e9) * 1e6 + 0.5 for p in pts], "kl_lr")


def test_bm25_idf_grid_boundary_distance(con):
    from databricks_observe_spark.operators.text import BM25_QUERIES

    probe = sorted({tok for _, toks in BM25_QUERIES for tok in toks})
    toklist = ", ".join(f"'{tok}'" for tok in probe)
    rows = con.execute(
        f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
       WHERE tok IN ({toklist}) GROUP BY tok),
nd AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT df.df, nd.n_docs FROM df CROSS JOIN nd
"""
    ).fetchall()
    pts = {
        max(math.floor((1.0 + (nd - df_ + 0.5) / (df_ + 0.5)) * 1e9 + 0.5), 1)
        for df_, nd in rows
    }
    _assert_margins([math.log(p / 1e9) * 1e6 + 0.5 for p in pts], "bm25")


def test_tfidf_product_grid_boundary_distance(con):
    """tfidf's hashed score floors tf * ln(n_docs/df) * 1e6 directly (a
    product-form floor like kl's pre-r09 shape) — measured safe at HEAD
    (min 5.7e7 ulp, the tf multipliers are small and the attained set
    tiny), so no hardening needed; this canary keeps it visible."""
    rows = con.execute(
        """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT DISTINCT tf.tf, df.df, n.n_docs
FROM tf JOIN df USING (tok) CROSS JOIN n
"""
    ).fetchall()
    ys = [tf_ * math.log(nd / df_) * 1e6 + 0.5 for tf_, df_, nd in rows]
    _assert_margins(ys, "tfidf")
