"""DuckDB oracle SQL for every entry in ``__spark_entry__.queries()``.

The driver's correctness gate runs each Spark query AND the SQL returned
here side-by-side on the same parquet tables (pre-registered DuckDB views:
region nation customer supplier part orders lineitem events documents
embeddings) and compares row counts, schemas and order-insensitive value
hashes.  Two engine-parity rules shape everything in this file:

* hashes are md5-based 48-bit ints (the one digest both engines share);
* every float output is ``round(x, 6)`` in BOTH engines, and top-k ties
  order by the rounded value + id so sub-1e-6 float noise cannot flip
  rows.

Iterative queries are *unrolled* (PageRank supersteps, LPA iterations) or
expressed as a recursive CTE (connected components) — the SQL is generated
by the same Python that parameterizes the Spark side, so iteration counts
can never drift apart.
"""

from __future__ import annotations

from graphlite_spark.functions.text import LANG_EN_THRESHOLD, STOPWORDS

# ---------------------------------------------------------------------------
# shared CTE prefixes
# ---------------------------------------------------------------------------

# events -> transcripts -> dense-id vertices -> reply/tool edges
# (mirrors sources/transcripts.transcripts_from_events + plans/derive)
GRAPH_CTES = """
transcripts AS MATERIALIZED (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 'tool'
              WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':' ||
           substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS text,
         tool, ts
  FROM (
    SELECT printf('conv%08d', user_id) AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
                AS INT) AS turn_idx,
           CASE WHEN event_type IN ('purchase','error') THEN event_type END AS tool,
           event_id, ts
    FROM events)
),
vertices AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS id,
         conv_id, turn_idx, text
  FROM transcripts
),
tv AS MATERIALIZED (
  SELECT t.conv_id, t.turn_idx, t.role, t.tool, v.id
  FROM transcripts t JOIN vertices v ON v.conv_id = t.conv_id AND v.turn_idx = t.turn_idx
),
reply_edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT id AS src,
           lead(id) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst
    FROM tv)
  WHERE dst IS NOT NULL
),
tool_edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT id AS src, role,
           min(CASE WHEN tool IS NOT NULL THEN id END) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS dst
    FROM tv)
  WHERE role = 'assistant' AND dst IS NOT NULL
),
edges AS MATERIALIZED (
  SELECT src, dst, 'reply' AS etype, CAST(1.0 AS DOUBLE) AS weight FROM reply_edges
  UNION ALL
  SELECT src, dst, 'tool' AS etype, CAST(1.0 AS DOUBLE) AS weight FROM tool_edges
),
deg AS MATERIALIZED (
  SELECT v.id, CAST(COALESCE(d.outdeg, 0) AS BIGINT) AS out_degree
  FROM vertices v LEFT JOIN (
    SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d ON d.src = v.id
),
und AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
)
""".strip()


def _graph_query(body: str, recursive: bool = False) -> str:
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} {GRAPH_CTES}\n{body}"


# tokenized documents
TOKS_CTE = (
    "toks_t AS MATERIALIZED (SELECT doc_id, "
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks "
    "FROM documents)"
)

_STOPLIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def _h48(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 12) AS BIGINT)"


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------

def transcripts_adapt_sql() -> str:
    return _graph_query(
        "SELECT conv_id, turn_idx, role, text, tool, "
        "CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM transcripts"
    )


def vertices_sql() -> str:
    return _graph_query("SELECT id, conv_id, turn_idx, text FROM vertices")


def edges_sql() -> str:
    return _graph_query("SELECT src, dst, etype, weight FROM edges")


def out_degrees_sql() -> str:
    return _graph_query("SELECT id, out_degree FROM deg")


def degree_histogram_sql() -> str:
    return _graph_query(
        "SELECT out_degree, CAST(count(*) AS BIGINT) AS n_vertices\n"
        "FROM deg GROUP BY out_degree"
    )


def msg_gather_ss1_sql() -> str:
    # superstep-0 scatter: every vertex sends 1.0/out_degree along each
    # out-edge; gather+combine = sum per destination
    return _graph_query(
        "SELECT e.dst AS dst, round(sum(1.0 / d.out_degree), 6) AS msg\n"
        "FROM edges e JOIN deg d ON d.id = e.src GROUP BY e.dst"
    )


def _pagerank_ctes(rounds: int) -> str:
    """pr0..pr{rounds}: pr0 = 1.0 everywhere, then `rounds` update rounds of
    unnormalized 0.15 + 0.85*sum (the reference recurrence)."""
    parts = [
        "pr0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS rank, out_degree FROM deg)"
    ]
    for k in range(1, rounds + 1):
        prev = f"pr{k - 1}"
        parts.append(
            f"pr{k} AS MATERIALIZED (\n"
            f"  SELECT p.id, 0.15 + 0.85 * COALESCE(m.s, 0.0) AS rank, p.out_degree\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
    return ",\n".join(parts)


def _trustrank_ctes(seeds: list[int], rounds: int) -> str:
    """tr0..tr{rounds}: unit mass over the sorted deduped seed list,
    then `rounds` update rounds of seed-teleport 0.15/|seeds|."""
    ss = sorted(set(int(x) for x in seeds))
    share = 1.0 / len(ss)
    inlist = ", ".join(str(x) for x in ss)
    tele = (
        f"CASE WHEN p.id IN ({inlist}) THEN 0.15 * {share!r}"
        " ELSE 0.0 END"
    )
    parts = [
        f"tr0 AS MATERIALIZED (SELECT id,\n"
        f"  CASE WHEN id IN ({inlist}) THEN CAST({share!r} AS DOUBLE)\n"
        f"       ELSE CAST(0.0 AS DOUBLE) END AS rank, out_degree FROM deg)"
    ]
    for k in range(1, rounds + 1):
        prev = f"tr{k - 1}"
        parts.append(
            f"tr{k} AS MATERIALIZED (\n"
            f"  SELECT p.id, {tele} + 0.85 * COALESCE(m.s, 0.0) AS rank,\n"
            f"         p.out_degree\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
    return ",\n".join(parts)


def trustrank_fixed_sql(seeds: list[int], supersteps: int = 8) -> str:
    """TrustRank (seed-set PPR), unrolled — teleport 0.15/|seeds| on the
    sorted deduped seed list, identical literal arithmetic."""
    rounds = supersteps - 1
    body = (
        f", {_trustrank_ctes(seeds, rounds)}\n"
        f"SELECT id, round(rank, 6) AS rank FROM tr{rounds}"
    )
    return _graph_query(body)


def spam_mass_sql(seeds: list[int], supersteps: int = 8) -> str:
    """Mirror of algos.pagerank.spam_mass: both unrolled rank chains
    (same literal arithmetic as their standalone oracles) joined on id,
    trust scaled by the vertex count."""
    rounds = supersteps - 1
    body = (
        f", {_pagerank_ctes(rounds)},\n"
        f"{_trustrank_ctes(seeds, rounds)},\n"
        "nv AS (SELECT count(*) AS n FROM vertices)\n"
        f"SELECT p.id, round(p.rank, 6) AS pagerank,\n"
        f"       round(t.rank, 6) AS trustrank,\n"
        f"       round((p.rank - nv.n * t.rank) / p.rank, 6) AS spam_mass\n"
        f"FROM pr{rounds} p JOIN tr{rounds} t ON t.id = p.id CROSS JOIN nv"
    )
    return _graph_query(body)


def weighted_pagerank_sql(supersteps: int = 10) -> str:
    """Mirror of algos.pagerank.weighted_pagerank over edges carrying the
    entry query's deterministic synthetic weights ``1 + h48(src:dst)%3``:
    FIXED-POINT micro-unit rounds with per-term integer division, so the
    unrolled CTEs are BIGINT-exact — no float summation order to
    diverge (DuckDB ``//`` == Spark ``div`` on non-negative longs)."""
    rounds = supersteps - 1
    wexpr = _h48("e.src || ':' || e.dst")
    parts = [
        f"we AS MATERIALIZED (SELECT src, dst,\n"
        f"  CAST(1 + {wexpr} % 3 AS BIGINT) AS w FROM edges e),\n"
        "ws AS MATERIALIZED (SELECT src, sum(w) AS wsum FROM we"
        " GROUP BY src),\n"
        "ew AS MATERIALIZED (SELECT src, dst, w, wsum FROM we"
        " JOIN ws USING (src)),\n"
        "wp0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS rank_m"
        " FROM vertices)"
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"wp{k} AS MATERIALIZED (\n"
            f"  SELECT v.id,\n"
            f"    CAST(150000 + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT)"
            f" AS rank_m\n"
            f"  FROM vertices v LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum((q.rank_m * e.w) // e.wsum) AS s\n"
            f"    FROM ew e JOIN wp{k - 1} q ON q.id = e.src"
            f" GROUP BY e.dst) m\n"
            f"  ON m.id = v.id)"
        )
    body = (
        ", " + ",\n".join(parts)
        + f"\nSELECT id, rank_m AS rank_micros FROM wp{rounds}"
    )
    return _graph_query(body)


def pagerank_warm_sql(
    warm_supersteps: int = 10,
    refine_supersteps: int = 5,
    batch_mod: int = 10,
) -> str:
    """Mirror of algos.pagerank.pagerank_warm_restart: a fixed warm
    chain over the old edges (hash48(src:dst) % batch_mod <> 0 — the
    incremental_cc split convention), then ``refine_supersteps`` rounds
    over ALL edges seeded from the warm scores with full-edge degrees."""
    h = _h48("e.src || ':' || e.dst")
    wr = warm_supersteps - 1  # superstep 0 initializes to 1.0
    parts = [
        f"eold AS MATERIALIZED (SELECT src, dst FROM edges e\n"
        f"  WHERE {h} % {batch_mod} <> 0)",
        "dold AS MATERIALIZED (SELECT v.id,"
        " CAST(COALESCE(c.n, 0) AS BIGINT) AS out_degree\n"
        "  FROM vertices v LEFT JOIN (SELECT src, count(*) AS n"
        " FROM eold GROUP BY src) c ON c.src = v.id)",
        "w0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS rank,"
        " out_degree FROM dold)",
    ]
    for k in range(1, wr + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (\n"
            f"  SELECT p.id, 0.15 + 0.85 * COALESCE(m.s, 0.0) AS rank,"
            f" p.out_degree\n"
            f"  FROM w{k - 1} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM eold e JOIN w{k - 1} q ON q.id = e.src"
            f" GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
    parts.append(
        f"r0 AS MATERIALIZED (SELECT d.id, w.rank, d.out_degree\n"
        f"  FROM deg d JOIN w{wr} w ON w.id = d.id)"
    )
    for k in range(1, refine_supersteps + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (\n"
            f"  SELECT p.id, 0.15 + 0.85 * COALESCE(m.s, 0.0) AS rank,"
            f" p.out_degree\n"
            f"  FROM r{k - 1} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM edges e JOIN r{k - 1} q ON q.id = e.src"
            f" GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, round(rank, 6) AS rank FROM r{refine_supersteps}"
    )
    return _graph_query(body)


def pagerank_fixed_sql(supersteps: int = 10) -> str:
    rounds = supersteps - 1  # superstep 0 initializes, 1..S-1 update
    body = (
        f", {_pagerank_ctes(rounds)}\n"
        f"SELECT id, round(rank, 6) AS rank FROM pr{rounds}"
    )
    return _graph_query(body)


def rank_agreement_sql(supersteps: int = 10) -> str:
    """Mirror of algos.stats.rank_agreement over (PageRank@supersteps,
    out-degree): identical 6dp-round → micros scores, the same
    (score DESC, id ASC) total order (expressed as ORDER BY -s, vid),
    exact BIGINT Σd², one final rounded division."""
    rounds = supersteps - 1
    body = (
        f", {_pagerank_ctes(rounds)},\n"
        "ca_a AS MATERIALIZED (SELECT id AS vid,\n"
        "  CAST(round(round(rank, 6) * 1000000, 0) AS BIGINT) AS s"
        f" FROM pr{rounds}),\n"
        "ca_b AS MATERIALIZED (SELECT id AS vid,"
        " out_degree AS s FROM deg),\n"
        "ca_ra AS MATERIALIZED (SELECT vid,\n"
        "  row_number() OVER (ORDER BY -s, vid) - 1 AS r1 FROM ca_a),\n"
        "ca_rb AS MATERIALIZED (SELECT vid,\n"
        "  row_number() OVER (ORDER BY -s, vid) - 1 AS r2 FROM ca_b),\n"
        "ca_j AS MATERIALIZED (SELECT (r1 - r2) * (r1 - r2) AS d2\n"
        "  FROM ca_ra JOIN ca_rb USING (vid))\n"
        "SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(SUM(d2) AS BIGINT) AS sum_d2,\n"
        "  CASE WHEN count(*) > 1 THEN\n"
        "    round(1.0 - (6.0 * CAST(SUM(d2) AS BIGINT))\n"
        "      / (CAST(count(*) AS DOUBLE)\n"
        "         * (count(*) * count(*) - 1)), 6)\n"
        "  END AS rho\n"
        "FROM ca_j"
    )
    return _graph_query(body)


def pagerank_by_role_sql(supersteps: int = 10) -> str:
    """Mirror of the entry's pagerank_by_role: PageRank@supersteps
    rounded 6dp → micros, joined to the role table, one grouped sum."""
    rounds = supersteps - 1
    body = (
        f", {_pagerank_ctes(rounds)},\n"
        "pm AS MATERIALIZED (\n"
        "  SELECT t.role,\n"
        "    CAST(round(round(p.rank, 6) * 1000000, 0) AS BIGINT) AS m\n"
        f"  FROM pr{rounds} p JOIN tv t ON t.id = p.id)\n"
        "SELECT role, CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(SUM(m) AS BIGINT) AS rank_micros\n"
        "FROM pm GROUP BY role"
    )
    return _graph_query(body)


def label_separability_sql() -> str:
    """Mirror of operators.kmeans.label_separability: per-label and
    global truncating-division centroids from the same micro sums,
    exact BIGINT scatter terms."""
    return (
        "WITH ls_q AS MATERIALIZED (SELECT label,\n"
        "  list_transform(embedding, x ->\n"
        "    CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS v\n"
        "  FROM embeddings),\n"
        "ls_s AS MATERIALIZED (\n"
        "  SELECT label, x.u.i AS i, CAST(SUM(x.u.x) AS BIGINT) AS s,\n"
        "    CAST(count(*) AS BIGINT) AS n\n"
        "  FROM (SELECT label, unnest(list_transform(range(1, len(v) + 1),\n"
        "      i -> {'i': i, 'x': v[i]})) AS u FROM ls_q) x\n"
        "  GROUP BY label, x.u.i),\n"
        "ls_cl AS MATERIALIZED (\n"
        "  SELECT label, list(s // n ORDER BY i) AS cv, MAX(n) AS n\n"
        "  FROM ls_s GROUP BY label),\n"
        "ls_g AS MATERIALIZED (\n"
        "  SELECT list(gs // gn ORDER BY i) AS gcl FROM (\n"
        "    SELECT i, CAST(SUM(s) AS BIGINT) AS gs,\n"
        "      CAST(SUM(n) AS BIGINT) AS gn FROM ls_s GROUP BY i)),\n"
        "ls_w AS MATERIALIZED (\n"
        "  SELECT q.label, CAST(SUM(list_sum(list_transform(\n"
        "    range(1, len(v) + 1),"
        " j -> (v[j] - cv[j]) * (v[j] - cv[j])))) AS BIGINT) AS within_ss\n"
        "  FROM ls_q q JOIN ls_cl USING (label) GROUP BY q.label),\n"
        "ls_b AS MATERIALIZED (\n"
        "  SELECT label, n, CAST(list_sum(list_transform(\n"
        "    range(1, len(cv) + 1),"
        " j -> (cv[j] - gcl[j]) * (cv[j] - gcl[j]))) AS BIGINT)"
        " AS centroid_dist_sq\n"
        "  FROM ls_cl, ls_g)\n"
        "SELECT b.label, b.n, w.within_ss, b.centroid_dist_sq,\n"
        "  CAST(b.n * b.centroid_dist_sq AS BIGINT) AS between_term\n"
        "FROM ls_b b JOIN ls_w w USING (label)"
    )


def ppr_fixed_sql(source: int = 0, supersteps: int = 8) -> str:
    """Personalized PageRank (teleport to ``source`` only), unrolled."""
    rounds = supersteps - 1
    tele = f"CASE WHEN p.id = {source} THEN 0.15 ELSE 0.0 END"
    parts = [
        f"pp0 AS MATERIALIZED (SELECT id,\n"
        f"  CASE WHEN id = {source} THEN CAST(1.0 AS DOUBLE)\n"
        f"       ELSE CAST(0.0 AS DOUBLE) END AS rank, out_degree FROM deg)"
    ]
    for k in range(1, rounds + 1):
        prev = f"pp{k - 1}"
        parts.append(
            f"pp{k} AS MATERIALIZED (\n"
            f"  SELECT p.id, {tele} + 0.85 * COALESCE(m.s, 0.0) AS rank,\n"
            f"         p.out_degree\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, round(rank, 6) AS rank FROM pp{rounds}"
    )
    return _graph_query(body)


def ppr_sweep_cut_sql(
    source: int = 0, supersteps: int = 8, top_l: int = 50
) -> str:
    """Mirror of algos.pagerank.ppr_sweep_cut: the unrolled PPR chain,
    the (round(rank,6) DESC, id) top-L spine, and the identical
    difference-array cut / prefix-sum volume / guarded conductance."""
    rounds = supersteps - 1
    tele = f"CASE WHEN p.id = {source} THEN 0.15 ELSE 0.0 END"
    parts = [
        f"pp0 AS MATERIALIZED (SELECT id,\n"
        f"  CASE WHEN id = {source} THEN CAST(1.0 AS DOUBLE)\n"
        f"       ELSE CAST(0.0 AS DOUBLE) END AS rank, out_degree FROM deg)"
    ]
    for k in range(1, rounds + 1):
        prev = f"pp{k - 1}"
        parts.append(
            f"pp{k} AS MATERIALIZED (\n"
            f"  SELECT p.id, {tele} + 0.85 * COALESCE(m.s, 0.0) AS rank,\n"
            f"         p.out_degree\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    big = 1 << 60
    body = f""", {joined},
topk AS MATERIALIZED (SELECT id, r FROM (
  SELECT id, CAST(row_number() OVER (
    ORDER BY round(rank, 6) DESC, id) AS BIGINT) AS r
  FROM pp{rounds}) WHERE r <= {top_l}),
udeg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
  FROM und GROUP BY src),
vt AS MATERIALIZED (SELECT CAST(sum(deg) AS BIGINT) AS vt FROM udeg),
tagged AS MATERIALIZED (
  SELECT a.r AS ra, b.r AS rb
  FROM (SELECT src, dst FROM und WHERE src < dst) p
  LEFT JOIN topk a ON a.id = p.src
  LEFT JOIN topk b ON b.id = p.dst
  WHERE a.r IS NOT NULL OR b.r IS NOT NULL),
ev AS MATERIALIZED (
  SELECT least(coalesce(ra, {big}), coalesce(rb, {big})) AS k, 1 AS d
  FROM tagged
  UNION ALL
  SELECT greatest(ra, rb) AS k, -1 AS d FROM tagged
  WHERE ra IS NOT NULL AND rb IS NOT NULL),
diffs AS MATERIALIZED (SELECT k, sum(d) AS dd FROM ev GROUP BY k),
spine AS MATERIALIZED (
  SELECT t.r AS k, coalesce(u.deg, 0) AS deg
  FROM topk t LEFT JOIN udeg u ON u.id = t.id),
curve AS MATERIALIZED (
  SELECT s.k,
    CAST(sum(coalesce(d.dd, 0)) OVER (ORDER BY s.k
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cut,
    CAST(sum(s.deg) OVER (ORDER BY s.k
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vol
  FROM spine s LEFT JOIN diffs d ON d.k = s.k)
SELECT k, cut, vol,
  CASE WHEN least(vol, (SELECT vt FROM vt) - vol) = 0 THEN 0.0
       ELSE round(cut / least(vol, (SELECT vt FROM vt) - vol), 6)
       END AS conductance
FROM curve"""
    return _graph_query(body)


def edgelist_pagerank_sql(path: str, n_vertices: int, supersteps: int = 10) -> str:
    """PageRank (fixed supersteps) over a reference-format edge-list text
    file — DuckDB parses the same file the Spark source reads
    (sources/edgelist.read_edge_list), skipping the 2-line header."""
    rounds = supersteps - 1
    return (
        "WITH edges AS MATERIALIZED (\n"
        f"  SELECT src, dst FROM read_csv('{path}', delim=' ', header=false,\n"
        "    skip=2, columns={'src': 'BIGINT', 'dst': 'BIGINT'})),\n"
        f"verts AS (SELECT range AS id FROM range({n_vertices})),\n"
        "deg AS MATERIALIZED (\n"
        "  SELECT v.id, CAST(COALESCE(d.outdeg, 0) AS BIGINT) AS out_degree\n"
        "  FROM verts v LEFT JOIN (\n"
        "    SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d ON d.src = v.id),\n"
        f"{_pagerank_ctes(rounds)}\n"
        f"SELECT id, round(rank, 6) AS rank FROM pr{rounds}"
    )


def pagerank_converged_sql(eps: float = 1e-6, max_rounds: int = 120) -> str:
    """Converged PageRank WITH the reference's halting timeline baked in —
    no engine run needed to parameterize the unroll.

    The engine halts at superstep H = min s>=2 with sum_delta(s-1) < eps
    (the voteToHalt branch, example/PageRankVertex.cc:152-157), reporting
    ``supersteps = H + 1`` (the halted superstep H still executes, then the
    master's act==0 && sent==0 test ends the run).  The SQL mirrors that
    exactly: each round k >= 2 FREEZES values when the previous round's
    Σ|Δ| dropped below eps, so unrolling past convergence is a no-op, and
    the reported superstep count is the first crossing + 1.  Contraction
    is ~0.85^k, so convergence lands near round 86 at any graph size —
    ``max_rounds`` = 120 gives margin; a graph that genuinely needs more
    would mismatch loudly, not silently.
    """
    parts = [
        "pr0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS rank, out_degree FROM deg)",
        # round 1 always updates (halting starts at s >= 2)
        "pr1 AS MATERIALIZED (\n"
        "  SELECT p.id, 0.15 + 0.85 * COALESCE(m.s, 0.0) AS rank, p.out_degree\n"
        "  FROM pr0 p LEFT JOIN (\n"
        "    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
        "    FROM edges e JOIN pr0 q ON q.id = e.src GROUP BY e.dst) m\n"
        "  ON m.id = p.id)",
        "d1 AS MATERIALIZED (SELECT sum(abs(a.rank - b.rank)) AS v\n"
        "  FROM pr1 a JOIN pr0 b ON a.id = b.id)",
    ]
    for k in range(2, max_rounds + 1):
        prev = f"pr{k - 1}"
        parts.append(
            f"pr{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"         CASE WHEN (SELECT v FROM d{k - 1}) < {eps} THEN p.rank\n"
            f"              ELSE 0.15 + 0.85 * COALESCE(m.s, 0.0) END AS rank,\n"
            f"         p.out_degree\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.rank / q.out_degree) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src GROUP BY e.dst) m\n"
            f"  ON m.id = p.id)"
        )
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT sum(abs(a.rank - b.rank)) AS v\n"
            f"  FROM pr{k} a JOIN pr{k - 1} b ON a.id = b.id)"
        )
    deltas = " UNION ALL ".join(
        f"SELECT {s} AS s, (SELECT v FROM d{s - 1}) AS v"
        for s in range(2, max_rounds + 1)
    )
    parts.append(
        f"halt AS MATERIALIZED (SELECT min(s) + 1 AS supersteps FROM ({deltas}) "
        f"WHERE v < {eps})"
    )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT p.id, round(p.rank, 6) AS rank,\n"
        f"       CAST(h.supersteps AS INTEGER) AS supersteps\n"
        f"FROM pr{max_rounds} p CROSS JOIN halt h"
    )
    return _graph_query(body)


def pagerank_argmax_delta_sql(at_superstep: int = 2) -> str:
    """Mirror of the engine's TYPED argmax aggregator: the vertex whose
    rank moved the most at ``at_superstep`` (tie-break: larger id), rounded
    to 6dp BEFORE comparison on both sides."""
    body = (
        f", {_pagerank_ctes(at_superstep)}\n"
        f"SELECT CAST(a.id AS BIGINT) AS argmax_id,\n"
        f"       round(abs(a.rank - b.rank), 6) AS max_delta\n"
        f"FROM pr{at_superstep} a JOIN pr{at_superstep - 1} b ON a.id = b.id\n"
        f"ORDER BY round(abs(a.rank - b.rank), 6) DESC, a.id DESC LIMIT 1"
    )
    return _graph_query(body)


def pagerank_sumdelta_sql(at_superstep: int = 2) -> str:
    body = (
        f", {_pagerank_ctes(at_superstep)}\n"
        f"SELECT round(sum(abs(a.rank - b.rank)), 6) AS sum_delta\n"
        f"FROM pr{at_superstep} a JOIN pr{at_superstep - 1} b ON a.id = b.id"
    )
    return _graph_query(body)


def bfs_sql(source: int = 0, supersteps: int = 7, inf: int = (1 << 62) - 1) -> str:
    """k-hop bounded BFS from ``source`` over directed edges, unrolled
    min-plus rounds (rounds = supersteps - 1, matching the engine's ss0
    initialization + delivery supersteps)."""
    parts = [
        f"b0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} THEN 0 END AS dist "
        "FROM vertices)"
    ]
    for k in range(1, supersteps):
        prev = f"b{k - 1}"
        parts.append(
            f"b{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"         CASE WHEN m.d IS NULL THEN p.dist\n"
            f"              WHEN p.dist IS NULL THEN m.d\n"
            f"              ELSE least(p.dist, m.d) END AS dist\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, min(q.dist) + 1 AS d\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src AND q.dist IS NOT NULL\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, CAST(COALESCE(dist, {inf}) AS BIGINT) AS dist "
        f"FROM b{supersteps - 1}"
    )
    return _graph_query(body)


def sp_counts_sql(source: int = 0, depth: int = 7,
                  inf: int = (1 << 62) - 1) -> str:
    """Unrolled layered σ propagation — identical rule and cap as
    algos.bfs.shortest_path_counts."""
    parts = [
        f"s0 AS MATERIALIZED (SELECT id,\n"
        f"  CASE WHEN id = {source} THEN 0 END AS dist,\n"
        f"  CAST(CASE WHEN id = {source} THEN 1 ELSE 0 END AS BIGINT) AS sigma\n"
        f"  FROM vertices)"
    ]
    for r in range(1, depth + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"s{r} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"    CASE WHEN p.dist IS NOT NULL THEN p.dist\n"
            f"         WHEN m.id IS NOT NULL THEN {r} END AS dist,\n"
            f"    CAST(CASE WHEN p.dist IS NOT NULL THEN p.sigma\n"
            f"         WHEN m.id IS NOT NULL THEN m.s\n"
            f"         ELSE 0 END AS BIGINT) AS sigma\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, SUM(q.sigma) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src AND q.dist = {r - 1}\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, CAST(COALESCE(dist, {inf}) AS BIGINT) AS dist, sigma "
        f"FROM s{depth}"
    )
    return _graph_query(body)


def stress_sql(source: int = 0, depth: int = 7,
               inf: int = (1 << 62) - 1) -> str:
    """Unrolled stress centrality — the sp_counts forward unroll plus a
    reverse-layer backward unroll of g(v) = Σ DAG-edges (1 + g(w));
    identical caps and the source-reports-0 endpoint convention."""
    parts = [
        f"s0 AS MATERIALIZED (SELECT id,\n"
        f"  CASE WHEN id = {source} THEN 0 END AS dist,\n"
        f"  CAST(CASE WHEN id = {source} THEN 1 ELSE 0 END AS BIGINT) AS sigma\n"
        f"  FROM vertices)"
    ]
    for r in range(1, depth + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"s{r} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"    CASE WHEN p.dist IS NOT NULL THEN p.dist\n"
            f"         WHEN m.id IS NOT NULL THEN {r} END AS dist,\n"
            f"    CAST(CASE WHEN p.dist IS NOT NULL THEN p.sigma\n"
            f"         WHEN m.id IS NOT NULL THEN m.s\n"
            f"         ELSE 0 END AS BIGINT) AS sigma\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, SUM(q.sigma) AS s\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src AND q.dist = {r - 1}\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    parts.append(
        f"g{depth} AS MATERIALIZED (SELECT id, dist, sigma, "
        f"CAST(0 AS BIGINT) AS g FROM s{depth})"
    )
    for d in range(depth - 1, -1, -1):
        prev = f"g{d + 1}"
        parts.append(
            f"g{d} AS MATERIALIZED (\n"
            f"  SELECT p.id, p.dist, p.sigma,\n"
            f"    CAST(CASE WHEN p.dist = {d} THEN COALESCE(c.gs, 0)\n"
            f"         ELSE p.g END AS BIGINT) AS g\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.src AS id, SUM(1 + w.g) AS gs\n"
            f"    FROM edges e JOIN {prev} w ON w.id = e.dst AND w.dist = {d + 1}\n"
            f"    GROUP BY e.src) c ON c.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, CAST(COALESCE(dist, {inf}) AS BIGINT) AS dist, sigma,\n"
        f"  CAST(CASE WHEN id = {source} THEN 0 ELSE sigma * g END AS BIGINT)"
        f" AS n_paths_through\n"
        f"FROM g0"
    )
    return _graph_query(body)


MICRO_UNIT = 1_000_000


def harmonic_sql(sources: tuple[int, ...] = (0, 1, 2, 3),
                 supersteps: int = 8) -> str:
    """Mirror of algos.centrality.harmonic_centrality (MS-BFS): bitmask
    levels unrolled (rounds = supersteps - 1 per the engine's ss0
    convention), each level OR-ing in-neighbor masks and accumulating
    bit_count(new bits) * (1e6 div level) micro-units."""
    cases = " ".join(
        f"WHEN {s} THEN {1 << i}" for i, s in enumerate(sources)
    )
    parts = [
        f"m0 AS MATERIALIZED (SELECT id,\n"
        f"  CAST(CASE id {cases} ELSE 0 END AS BIGINT) AS mask,\n"
        "  CAST(0 AS BIGINT) AS h FROM vertices)"
    ]
    for t in range(1, supersteps):
        prev = f"m{t - 1}"
        parts.append(
            f"m{t} AS MATERIALIZED (\n"
            "  SELECT v.id, v.mask | COALESCE(i.im, 0) AS mask,\n"
            "    v.h + CAST(bit_count(COALESCE(i.im, 0) & ~v.mask)"
            f" AS BIGINT) * {MICRO_UNIT // t} AS h\n"
            f"  FROM {prev} v LEFT JOIN (\n"
            "    SELECT e.dst AS id, bit_or(s.mask) AS im\n"
            f"    FROM edges e JOIN {prev} s ON s.id = e.src"
            " AND s.mask <> 0\n"
            "    GROUP BY e.dst) i ON i.id = v.id)"
        )
    body = (
        ", " + ",\n".join(parts) + "\n"
        f"SELECT id, mask, h AS harmonic_micros FROM m{supersteps - 1}"
    )
    return _graph_query(body)


def lin_sql(sources: tuple[int, ...] = (0, 100, 200, 300),
            supersteps: int = 8) -> str:
    """Mirror of algos.centrality.lin_centrality: harmonic_sql's
    unrolled MS-BFS levels accumulating cnt (bit_count of new bits) and
    sd (cnt · level) instead of the harmonic sum; final Lin index is the
    identical exact BIGINT division with the same 0 / 10^6 edge cases."""
    cases = " ".join(
        f"WHEN {s} THEN {1 << i}" for i, s in enumerate(sources)
    )
    parts = [
        f"m0 AS MATERIALIZED (SELECT id,\n"
        f"  CAST(CASE id {cases} ELSE 0 END AS BIGINT) AS mask,\n"
        "  CAST(0 AS BIGINT) AS sd,\n"
        f"  CAST(bit_count(CAST(CASE id {cases} ELSE 0 END AS BIGINT))"
        " AS BIGINT) AS cnt FROM vertices)"
    ]
    for t in range(1, supersteps):
        prev = f"m{t - 1}"
        parts.append(
            f"m{t} AS MATERIALIZED (\n"
            "  SELECT v.id, v.mask | COALESCE(i.im, 0) AS mask,\n"
            "    v.sd + CAST(bit_count(COALESCE(i.im, 0) & ~v.mask)"
            f" AS BIGINT) * {t} AS sd,\n"
            "    v.cnt + CAST(bit_count(COALESCE(i.im, 0) & ~v.mask)"
            " AS BIGINT) AS cnt\n"
            f"  FROM {prev} v LEFT JOIN (\n"
            "    SELECT e.dst AS id, bit_or(s.mask) AS im\n"
            f"    FROM edges e JOIN {prev} s ON s.id = e.src"
            " AND s.mask <> 0\n"
            "    GROUP BY e.dst) i ON i.id = v.id)"
        )
    body = (
        ", " + ",\n".join(parts) + "\n"
        "SELECT id, cnt AS reached, sd AS sum_dist,\n"
        "  CAST(CASE WHEN cnt = 0 THEN 0 WHEN sd = 0 THEN "
        f"{MICRO_UNIT} ELSE ({MICRO_UNIT} * cnt * cnt) // sd END"
        " AS BIGINT) AS lin_micros\n"
        f"FROM m{supersteps - 1}"
    )
    return _graph_query(body)


def betweenness_sql(sources: tuple[int, ...], max_depth: int = 6) -> str:
    """Mirror of algos.betweenness.betweenness_sampled: the forward BFS
    levels (sigma path counts, first-arrival anti joins) and backward
    Brandes dependency levels unrolled, each delta term the identical
    exact BIGINT expression ``(sigma_v * (1e6 + delta_w)) // sigma_w``.
    DuckDB SUM returns HUGEINT — every aggregate is cast back to BIGINT
    to keep the arithmetic in the engine-shared type."""
    vals = ", ".join(f"({s})" for s in sources)
    parts = [
        "arcs AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges"
        " WHERE src <> dst)",
        f"f0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS BIGINT) AS sigma"
        f" FROM (VALUES {vals}) AS S(s))",
        "r0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for t in range(1, max_depth + 1):
        parts.append(
            f"f{t} AS MATERIALIZED (\n"
            "  SELECT c.s, c.v, c.sigma FROM (\n"
            "    SELECT f.s, a.dst AS v, CAST(SUM(f.sigma) AS BIGINT)"
            " AS sigma\n"
            f"    FROM f{t - 1} f JOIN arcs a ON a.src = f.v\n"
            "    GROUP BY f.s, a.dst) c\n"
            f"  ANTI JOIN r{t - 1} r ON r.s = c.s AND r.v = c.v)"
        )
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT * FROM r{t - 1}"
            f" UNION ALL SELECT s, v FROM f{t})"
        )
    parts.append(
        f"d{max_depth} AS MATERIALIZED (SELECT s, v, sigma,"
        f" CAST(0 AS BIGINT) AS delta FROM f{max_depth})"
    )
    for t in range(max_depth - 1, 0, -1):
        parts.append(
            f"d{t} AS MATERIALIZED (\n"
            "  SELECT ft.s, ft.v, ft.sigma,"
            " CAST(COALESCE(x.dl, 0) AS BIGINT) AS delta\n"
            f"  FROM f{t} ft LEFT JOIN (\n"
            "    SELECT g.s, g.v, CAST(SUM((g.sigma *"
            f" ({MICRO_UNIT} + dn.delta)) // dn.sigma) AS BIGINT) AS dl\n"
            f"    FROM f{t} g JOIN arcs a ON a.src = g.v\n"
            f"    JOIN d{t + 1} dn ON dn.s = g.s AND dn.v = a.dst\n"
            "    GROUP BY g.s, g.v) x ON x.s = ft.s AND x.v = ft.v)"
        )
    if max_depth >= 2:
        alld = "\n  UNION ALL\n".join(
            f"  SELECT v, delta FROM d{t}" for t in range(1, max_depth)
        )
        parts.append("alld AS MATERIALIZED (\n" + alld + ")")
        bexpr = (
            "LEFT JOIN (SELECT v, CAST(SUM(delta) AS BIGINT) AS bm"
            " FROM alld GROUP BY v) b ON b.v = vt.id"
        )
    else:
        bexpr = "LEFT JOIN (SELECT CAST(NULL AS BIGINT) AS v," \
                " CAST(NULL AS BIGINT) AS bm) b ON b.v = vt.id"
    body = (
        ", " + ",\n".join(parts) + "\n"
        "SELECT vt.id, CAST(COALESCE(b.bm, 0) AS BIGINT)"
        " AS betweenness_micros\n"
        f"FROM vertices vt {bexpr}"
    )
    return _graph_query(body)


def eccentricity_sql(sources: tuple[int, ...] = (0, 100, 200, 300),
                     supersteps: int = 8) -> str:
    """Mirror of algos.centrality.eccentricity: the same unrolled MS-BFS
    mask levels as harmonic_sql; ecc(s) = the max level at which bit i
    newly appears ANYWHERE (the aggregator-timeline semantics), reached =
    final popcount of bit i (self included)."""
    cases = " ".join(
        f"WHEN {s} THEN {1 << i}" for i, s in enumerate(sources)
    )
    parts = [
        f"m0 AS MATERIALIZED (SELECT id,\n"
        f"  CAST(CASE id {cases} ELSE 0 END AS BIGINT) AS mask"
        " FROM vertices)"
    ]
    for t in range(1, supersteps):
        prev = f"m{t - 1}"
        parts.append(
            f"m{t} AS MATERIALIZED (\n"
            "  SELECT v.id, v.mask | COALESCE(i.im, 0) AS mask\n"
            f"  FROM {prev} v LEFT JOIN (\n"
            "    SELECT e.dst AS id, bit_or(s.mask) AS im\n"
            f"    FROM edges e JOIN {prev} s ON s.id = e.src"
            " AND s.mask <> 0\n"
            "    GROUP BY e.dst) i ON i.id = v.id)"
        )
    lvls = "\n  UNION ALL\n".join(
        f"  SELECT {t} AS lvl, bit_or(a.mask & ~b.mask) AS nb\n"
        f"  FROM m{t} a JOIN m{t - 1} b ON b.id = a.id"
        for t in range(1, supersteps)
    )
    parts.append("lv AS MATERIALIZED (\n" + lvls + ")")
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({s} AS BIGINT) AS source,\n"
        f"  CAST(COALESCE((SELECT max(lvl) FROM lv"
        f" WHERE (nb >> {i}) & 1 = 1), 0) AS BIGINT) AS eccentricity,\n"
        f"  CAST((SELECT count(*) FROM m{supersteps - 1}"
        f" WHERE (mask >> {i}) & 1 = 1) AS BIGINT) AS reached"
        for i, s in enumerate(sources)
    )
    body = ", " + ",\n".join(parts) + "\n" + selects
    return _graph_query(body)


_WEDGES_CTE = (
    "wedges AS MATERIALIZED (SELECT src, dst,\n"
    "  CAST(1 + (src + dst) % 4 AS DOUBLE) AS w FROM edges)"
)


def _sssp_ctes(source: int, rounds: int) -> str:
    """s0..s{rounds}: unrolled min-plus relaxation over weighted edges
    (weights = 1 + (src+dst)%4, the same derivation the Spark query uses).
    NULL dist = unreached."""
    parts = [
        _WEDGES_CTE,
        f"s0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} "
        "THEN CAST(0.0 AS DOUBLE) END AS dist FROM vertices)",
    ]
    for k in range(1, rounds + 1):
        prev = f"s{k - 1}"
        parts.append(
            f"s{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"         CASE WHEN m.d IS NULL THEN p.dist\n"
            f"              WHEN p.dist IS NULL THEN m.d\n"
            f"              ELSE least(p.dist, m.d) END AS dist\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, min(q.dist + e.w) AS d\n"
            f"    FROM wedges e JOIN {prev} q ON q.id = e.src AND q.dist IS NOT NULL\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    return ",\n".join(parts)


def sssp_sql(source: int = 0, supersteps: int = 7) -> str:
    """Weighted SSSP after ``supersteps`` (rounds = supersteps - 1, same
    ss0-initializes convention as bfs_sql)."""
    body = (
        f", {_sssp_ctes(source, supersteps - 1)}\n"
        f"SELECT id, round(dist, 6) AS dist FROM s{supersteps - 1}"
    )
    return _graph_query(body)


def sssp_maxdist_sql(source: int = 0, supersteps: int = 7) -> str:
    """The max-merge global aggregator: largest finite distance settled."""
    body = (
        f", {_sssp_ctes(source, supersteps - 1)}\n"
        f"SELECT round(max(dist), 6) AS max_dist FROM s{supersteps - 1}"
    )
    return _graph_query(body)


def sssp_parents_sql(source: int = 0, supersteps: int = 7) -> str:
    """Struct-state SSSP mirror: per-vertex (dist, parent) evolves as a
    lexicographic struct-min in BOTH engines (DuckDB orders STRUCTs
    field-wise exactly like Spark), so the parent tree is deterministic."""
    rounds = supersteps - 1
    parts = [
        _WEDGES_CTE,
        f"p0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} THEN\n"
        "  {'dist': CAST(0.0 AS DOUBLE), 'parent': CAST(-1 AS BIGINT)} END AS st\n"
        "FROM vertices)",
    ]
    for k in range(1, rounds + 1):
        prev = f"p{k - 1}"
        parts.append(
            f"p{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"         CASE WHEN m.st IS NULL THEN p.st\n"
            f"              WHEN p.st IS NULL THEN m.st\n"
            f"              WHEN m.st < p.st THEN m.st ELSE p.st END AS st\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id,\n"
            f"           min({{'dist': (q.st).dist + e.w, 'parent': q.id}}) AS st\n"
            f"    FROM wedges e JOIN {prev} q ON q.id = e.src AND q.st IS NOT NULL\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, round((st).dist, 6) AS dist, (st).parent AS parent "
        f"FROM p{rounds}"
    )
    return _graph_query(body)


def hits_sql(iterations: int = 3) -> str:
    """Unrolled HITS (unnormalized — all-integer, bit-exact)."""
    parts = ["h0 AS MATERIALIZED (SELECT id, CAST(1 AS BIGINT) AS hub FROM vertices)"]
    for k in range(1, iterations + 1):
        parts.append(
            f"a{k} AS MATERIALIZED (\n"
            f"  SELECT v.id, CAST(COALESCE(m.s, 0) AS BIGINT) AS auth\n"
            f"  FROM vertices v LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(h.hub) AS s FROM edges e\n"
            f"    JOIN h{k - 1} h ON h.id = e.src GROUP BY e.dst) m ON m.id = v.id)"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (\n"
            f"  SELECT v.id, CAST(COALESCE(m.s, 0) AS BIGINT) AS hub\n"
            f"  FROM vertices v LEFT JOIN (\n"
            f"    SELECT e.src AS id, sum(a.auth) AS s FROM edges e\n"
            f"    JOIN a{k} a ON a.id = e.dst GROUP BY e.src) m ON m.id = v.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT a.id, a.auth, h.hub FROM a{iterations} a "
        f"JOIN h{iterations} h ON h.id = a.id"
    )
    return _graph_query(body)


def salsa_sql(iterations: int = 3) -> str:
    """Unrolled SALSA — identical fixed-point micro-units and per-vertex
    truncating division as algos.hits.salsa (DuckDB ``//`` == Spark
    ``div`` on the non-negative longs these chains produce)."""
    parts = [
        "ind AS MATERIALIZED (SELECT dst AS id, count(*) AS ind"
        " FROM edges GROUP BY dst)",
        "outd AS MATERIALIZED (SELECT src AS id, count(*) AS outd"
        " FROM edges GROUP BY src)",
        "sa0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS auth_m"
        " FROM vertices)",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f"sh{k} AS MATERIALIZED (\n"
            f"  SELECT v.id, CAST(COALESCE(m.s, 0) AS BIGINT) AS hub_m\n"
            f"  FROM vertices v LEFT JOIN (\n"
            f"    SELECT e.src AS id, sum(q.adiv) AS s FROM edges e JOIN (\n"
            f"      SELECT a.id, a.auth_m // i.ind AS adiv\n"
            f"      FROM sa{k - 1} a JOIN ind i ON i.id = a.id) q\n"
            f"    ON q.id = e.dst GROUP BY e.src) m ON m.id = v.id)"
        )
        parts.append(
            f"sa{k} AS MATERIALIZED (\n"
            f"  SELECT v.id, CAST(COALESCE(m.s, 0) AS BIGINT) AS auth_m\n"
            f"  FROM vertices v LEFT JOIN (\n"
            f"    SELECT e.dst AS id, sum(q.hdiv) AS s FROM edges e JOIN (\n"
            f"      SELECT h.id, h.hub_m // o.outd AS hdiv\n"
            f"      FROM sh{k} h JOIN outd o ON o.id = h.id) q\n"
            f"    ON q.id = e.src GROUP BY e.dst) m ON m.id = v.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT a.id, a.auth_m, h.hub_m FROM sa{iterations} a\n"
        f"JOIN sh{iterations} h ON h.id = a.id"
    )
    return _graph_query(body)


def ring_rotate_sql(rounds: int = 3) -> str:
    """Closed form of the K-round point-send rotation: value(id) =
    (id - K) mod V over the derived vertex set."""
    return _graph_query(
        "SELECT id, CAST((id - {k} + n.v) % n.v AS BIGINT) AS rotated_from\n"
        "FROM vertices CROSS JOIN (SELECT count(*) AS v FROM vertices) n".format(
            k=rounds
        )
    )


def components_sql() -> str:
    body = (
        ", reach(id, r) AS (\n"
        "  SELECT id, id FROM vertices\n"
        "  UNION\n"
        "  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id)\n"
        "SELECT id, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY id"
    )
    return _graph_query(body, recursive=True)


def attack_tolerance_sql(remove_k: int = 10) -> str:
    """Mirror of algos.components.attack_tolerance: the (degree DESC,
    id ASC) top-k hub pick over und, the surviving subgraph's recursive
    min-label CC, the exact-ratio giant fraction of the ORIGINAL
    vertex count."""
    # DuckDB quirk (measured): under WITH RECURSIVE the plain UNION in
    # the shared `und` CTE stops DEDUPLICATING (2522 vs 2304 rows on the
    # sf0.001 graph) — harmless for reach closures (why components_sql
    # passes) but fatal for degree counts, so the degree CTE re-distincts
    # explicitly; the top-k rides a window (same guard).
    body = (
        ", at_deg AS MATERIALIZED (\n"
        "  SELECT src AS id, count(*) AS d FROM\n"
        "    (SELECT DISTINCT src, dst FROM und) GROUP BY src),\n"
        "at_hub AS MATERIALIZED (SELECT id FROM (\n"
        "  SELECT id, row_number() OVER (ORDER BY d DESC, id ASC)"
        " AS rn FROM at_deg)\n"
        f"  WHERE rn <= {remove_k}),\n"
        "at_vf AS MATERIALIZED (SELECT id FROM vertices\n"
        "  WHERE id NOT IN (SELECT id FROM at_hub)),\n"
        "at_ef AS MATERIALIZED (SELECT src, dst FROM und\n"
        "  WHERE src NOT IN (SELECT id FROM at_hub)\n"
        "    AND dst NOT IN (SELECT id FROM at_hub)),\n"
        "at_reach(id, r) AS (\n"
        "  SELECT id, id FROM at_vf\n"
        "  UNION\n"
        "  SELECT u.dst, at_reach.r FROM at_reach"
        " JOIN at_ef u ON u.src = at_reach.id),\n"
        "at_comp AS (SELECT id, min(r) AS component"
        " FROM at_reach GROUP BY id),\n"
        "at_g AS (SELECT CAST(COALESCE(max(cnt), 0) AS BIGINT) AS giant\n"
        "  FROM (SELECT count(*) AS cnt FROM at_comp GROUP BY component)),\n"
        "at_nh AS (SELECT CAST(count(*) AS BIGINT) AS nh FROM at_hub),\n"
        "at_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vertices)\n"
        "SELECT nh AS removed, n AS n_vertices, giant AS giant_size,\n"
        "  CAST((1000000 * giant - (1000000 * giant) % n) // n"
        " AS BIGINT) AS giant_micros\n"
        "FROM at_g, at_n, at_nh"
    )
    return _graph_query(body, recursive=True)


def component_histogram_sql() -> str:
    """Component-size distribution: the recursive min-label CC as a CTE,
    then two grouped counts (size per component, components per size)."""
    body = (
        ", reach(id, r) AS (\n"
        "  SELECT id, id FROM vertices\n"
        "  UNION\n"
        "  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.id),\n"
        "comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),\n"
        "sizes AS (SELECT component, count(*) AS n_vertices\n"
        "  FROM comp GROUP BY component)\n"
        "SELECT CAST(n_vertices AS BIGINT) AS n_vertices,\n"
        "  CAST(count(*) AS BIGINT) AS n_components\n"
        "FROM sizes GROUP BY n_vertices"
    )
    return _graph_query(body, recursive=True)


def kcore_sql(k: int = 3, max_rounds: int = 40) -> str:
    """Unrolled k-core peel — identical round rule + cap as algos.k_core,
    so SQL/Spark equality holds whether or not the cap binds."""
    parts = ["kc0 AS MATERIALIZED (SELECT id FROM vertices)"]
    for r in range(1, max_rounds + 1):
        prev = f"kc{r - 1}"
        parts.append(
            f"kc{r} AS MATERIALIZED (\n"
            f"  SELECT v.id FROM {prev} v JOIN (\n"
            f"    SELECT u.src, count(*) AS c FROM und u\n"
            f"    JOIN {prev} x ON x.id = u.src\n"
            f"    JOIN {prev} y ON y.id = u.dst\n"
            f"    GROUP BY u.src) d ON d.src = v.id AND d.c >= {k})"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT v.id, c.id IS NOT NULL AS in_core\n"
        f"FROM vertices v LEFT JOIN kc{max_rounds} c ON c.id = v.id"
    )
    return _graph_query(body)


def coreness_sql(max_k: int = 4, max_rounds: int = 64) -> str:
    """Unrolled iterated-peel core decomposition — level k peels from
    level k-1's survivors with the identical round rule and caps as
    algos.components.coreness, so Spark/SQL equality holds even where a
    cap binds.  Rounds past a level's fixpoint are no-ops (the peel is
    monotone), matching the Spark side's early exit."""
    parts = ["c1_0 AS MATERIALIZED (SELECT id FROM vertices)"]
    for k in range(1, max_k + 1):
        if k > 1:
            parts.append(
                f"c{k}_0 AS MATERIALIZED (SELECT id FROM c{k - 1}_{max_rounds})"
            )
        for r in range(1, max_rounds + 1):
            prev = f"c{k}_{r - 1}"
            parts.append(
                f"c{k}_{r} AS MATERIALIZED (\n"
                f"  SELECT v.id FROM {prev} v JOIN (\n"
                f"    SELECT u.src, count(*) AS c FROM und u\n"
                f"    JOIN {prev} x ON x.id = u.src\n"
                f"    JOIN {prev} y ON y.id = u.dst\n"
                f"    GROUP BY u.src) d ON d.src = v.id AND d.c >= {k})"
            )
    joined = ",\n".join(parts)
    case = (
        "CASE "
        + " ".join(
            f"WHEN c{k}.id IS NOT NULL THEN {k}" for k in range(max_k, 0, -1)
        )
        + " ELSE 0 END"
    )
    joins = "\n".join(
        f"LEFT JOIN c{k}_{max_rounds} c{k} ON c{k}.id = v.id"
        for k in range(1, max_k + 1)
    )
    body = (
        f", {joined}\n"
        f"SELECT v.id, CAST({case} AS BIGINT) AS coreness\n"
        f"FROM vertices v\n{joins}"
    )
    return _graph_query(body)


def _lpa_parts(iterations: int) -> list[str]:
    parts = ["l0 AS MATERIALIZED (SELECT id, id AS label FROM vertices)"]
    for k in range(1, iterations + 1):
        prev = f"l{k - 1}"
        parts.append(
            f"l{k} AS MATERIALIZED (\n"
            f"  SELECT l.id, COALESCE(b.lbl, l.label) AS label\n"
            f"  FROM {prev} l LEFT JOIN (\n"
            f"    SELECT id, lbl FROM (\n"
            f"      SELECT u.dst AS id, p.label AS lbl,\n"
            f"             row_number() OVER (PARTITION BY u.dst\n"
            f"               ORDER BY count(*) DESC, p.label ASC) AS rn\n"
            f"      FROM und u JOIN {prev} p ON p.id = u.src\n"
            f"      GROUP BY u.dst, p.label)\n"
            f"    WHERE rn = 1) b ON b.id = l.id)"
        )
    return parts


def lpa_sql(iterations: int = 3) -> str:
    joined = ",\n".join(_lpa_parts(iterations))
    body = f", {joined}\nSELECT id, label FROM l{iterations}"
    return _graph_query(body)


def conductance_sql(lpa_iterations: int = 3, top_k: int = 5) -> str:
    """Mirror of algos.community.conductance over the LPA-N labeling:
    exact volumes/cuts in directed representations, top-k communities by
    (size DESC, label ASC), phi = cut / min(vol, m2 - vol) at 6dp."""
    parts = _lpa_parts(lpa_iterations)
    parts.append(
        f"lab AS MATERIALIZED (SELECT id, label FROM l{lpa_iterations})"
    )
    parts.append(
        "topk AS MATERIALIZED (SELECT label,"
        " CAST(count(*) AS BIGINT) AS n_vertices FROM lab\n"
        f"  GROUP BY label ORDER BY count(*) DESC, label ASC LIMIT {top_k})"
    )
    parts.append("m2t AS MATERIALIZED (SELECT count(*) AS m2 FROM und)")
    parts.append(
        "per AS MATERIALIZED (\n"
        "  SELECT ls.label, CAST(count(*) AS BIGINT) AS volume,\n"
        "    CAST(sum(CASE WHEN ls.label <> ld.label THEN 1 ELSE 0 END)"
        " AS BIGINT) AS cut_edges\n"
        "  FROM und u JOIN lab ls ON ls.id = u.src"
        " JOIN lab ld ON ld.id = u.dst\n"
        "  JOIN topk t ON t.label = ls.label\n"
        "  GROUP BY ls.label)"
    )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        "SELECT t.label, t.n_vertices,\n"
        "  CAST(COALESCE(p.volume, 0) AS BIGINT) AS volume,\n"
        "  CAST(COALESCE(p.cut_edges, 0) AS BIGINT) AS cut_edges,\n"
        "  CASE WHEN least(COALESCE(p.volume, 0),\n"
        "                  (SELECT m2 FROM m2t) - COALESCE(p.volume, 0)) > 0\n"
        "    THEN round(COALESCE(p.cut_edges, 0) * 1.0 /\n"
        "      least(p.volume, (SELECT m2 FROM m2t) - p.volume), 6)\n"
        "  END AS conductance\n"
        "FROM topk t LEFT JOIN per p ON p.label = t.label"
    )
    return _graph_query(body)


def louvain_move_sql(lpa_iterations: int = 3) -> str:
    """Mirror of algos.community.louvain_move over the LPA-N labeling:
    the identical integer gain score m2·(e_vc − e_va) − d_v·(S_c − S_a +
    d_v), positive-gain argmax, (score DESC, c ASC) tie-break."""
    parts = _lpa_parts(lpa_iterations)
    parts.append(
        f"lab AS MATERIALIZED (SELECT id, label FROM l{lpa_iterations})"
    )
    parts.append(
        "dv AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM und GROUP BY src)"
    )
    parts.append("m2t AS MATERIALIZED (SELECT count(*) AS m2 FROM und)")
    parts.append(
        "strn AS MATERIALIZED (\n"
        "  SELECT l.label, SUM(d.d) AS s FROM lab l\n"
        "  JOIN dv d ON d.id = l.id GROUP BY l.label)"
    )
    parts.append(
        "evc AS MATERIALIZED (\n"
        "  SELECT u.src AS v, l.label AS c, count(*) AS e\n"
        "  FROM und u JOIN lab l ON l.id = u.dst GROUP BY u.src, l.label)"
    )
    parts.append(
        "eva AS MATERIALIZED (\n"
        "  SELECT e.v, e.e AS ea FROM evc e\n"
        "  JOIN lab o ON o.id = e.v AND e.c = o.label)"
    )
    parts.append(
        "cand AS MATERIALIZED (\n"
        "  SELECT e.v, e.c,\n"
        "    (SELECT m2 FROM m2t) * (e.e - COALESCE(a.ea, 0))\n"
        "      - d.d * (sc.s - sa.s + d.d) AS score\n"
        "  FROM evc e\n"
        "  JOIN lab o ON o.id = e.v AND e.c <> o.label\n"
        "  LEFT JOIN eva a ON a.v = e.v\n"
        "  JOIN strn sc ON sc.label = e.c\n"
        "  JOIN strn sa ON sa.label = o.label\n"
        "  JOIN dv d ON d.id = e.v)"
    )
    parts.append(
        "best AS MATERIALIZED (\n"
        "  SELECT v, c FROM (\n"
        "    SELECT v, c, row_number() OVER (\n"
        "      PARTITION BY v ORDER BY score DESC, c ASC) AS rn\n"
        "    FROM cand WHERE score > 0)\n"
        "  WHERE rn = 1)"
    )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        "SELECT l.id, COALESCE(b.c, l.label) AS label\n"
        "FROM lab l LEFT JOIN best b ON b.v = l.id"
    )
    return _graph_query(body)


_TRI_CTES = """
o AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst),
tri AS MATERIALIZED (
  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
  FROM o e1
  JOIN o e2 ON e2.a = e1.a AND e1.b < e2.b
  JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b)
""".strip()


def triangles_total_sql() -> str:
    return _graph_query(
        f", {_TRI_CTES}\nSELECT CAST(count(*) AS BIGINT) AS triangles FROM tri"
    )


def edge_support_sql() -> str:
    """Mirror of algos.triangles.edge_support: per-edge triangle count
    over the undirected closure, zero-support edges kept."""
    body = (
        f", {_TRI_CTES},\n"
        "sup AS MATERIALIZED (\n"
        "  SELECT lo, hi, CAST(count(*) AS BIGINT) AS s FROM (\n"
        "    SELECT v1 AS lo, v2 AS hi FROM tri\n"
        "    UNION ALL SELECT v1, v3 FROM tri\n"
        "    UNION ALL SELECT v2, v3 FROM tri)\n"
        "  GROUP BY lo, hi)\n"
        "SELECT o.a AS lo, o.b AS hi,\n"
        "  CAST(COALESCE(s, 0) AS BIGINT) AS support\n"
        "FROM o LEFT JOIN sup ON sup.lo = o.a AND sup.hi = o.b"
    )
    return _graph_query(body)


def partition_cut_sql(num_partitions: int = 8, salt: str = "cut") -> str:
    """Mirror of operators.partitioning.partition_cut_report over the
    derived edge table: shared 48-bit md5 placement vs contiguous id
    blocks, exact cut counts, one 6dp division per strategy row."""
    hs = _h48(f"'{salt}' || ':' || CAST(src AS VARCHAR)")
    hd = _h48(f"'{salt}' || ':' || CAST(dst AS VARCHAR)")
    P = num_partitions
    return _graph_query(
        ", b AS MATERIALIZED (SELECT min(least(src, dst)) AS mn,\n"
        "    max(greatest(src, dst)) AS mx FROM edges),\n"
        "blk AS MATERIALIZED (SELECT mn,"
        f" (mx - mn + {P}) // {P} AS block FROM b),\n"
        "cuts AS MATERIALIZED (SELECT\n"
        "  CAST(count(*) AS BIGINT) AS n,\n"
        f"  CAST(sum(CASE WHEN {hs} % {P} <> {hd} % {P}"
        " THEN 1 ELSE 0 END) AS BIGINT) AS hc,\n"
        "  CAST(sum(CASE WHEN (e.src - blk.mn) // blk.block <>\n"
        "    (e.dst - blk.mn) // blk.block THEN 1 ELSE 0 END) AS BIGINT)"
        " AS rc\n"
        "  FROM edges e, blk)\n"
        "SELECT 'hash' AS strategy, n AS n_edges, hc AS cut_edges,\n"
        "  CASE WHEN n > 0 THEN round(hc * 1.0 / n, 6) END AS cut_fraction"
        " FROM cuts\n"
        "UNION ALL\n"
        "SELECT 'range', n, rc,"
        " CASE WHEN n > 0 THEN round(rc * 1.0 / n, 6) END FROM cuts"
    )


def pricing_summary_sql(ship_cutoff: str = "1998-09-01") -> str:
    """Mirror of operators.relational.pricing_summary: identical per-ROW
    micro-unit rounding before the exact BIGINT sums."""
    return (
        "SELECT l_returnflag, l_linestatus,\n"
        "  CAST(sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT))"
        " AS BIGINT) AS sum_qty_micros,\n"
        "  CAST(sum(CAST(round(l_extendedprice * 1000000, 0) AS BIGINT))"
        " AS BIGINT) AS sum_base_micros,\n"
        "  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
        " * 1000000, 0) AS BIGINT)) AS BIGINT) AS sum_disc_micros,\n"
        "  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
        " * (1 + l_tax) * 1000000, 0) AS BIGINT)) AS BIGINT)"
        " AS sum_charge_micros,\n"
        "  CAST(count(*) AS BIGINT) AS count_order\n"
        "FROM lineitem\n"
        f"WHERE l_shipdate <= TIMESTAMP '{ship_cutoff} 00:00:00'\n"
        "GROUP BY l_returnflag, l_linestatus"
    )


def shipping_priority_sql(
    segment: str = "BUILDING", date: str = "1998-01-01", n: int = 10
) -> str:
    """Mirror of operators.relational.shipping_priority."""
    return (
        "SELECT o_orderkey, o_orderdate, o_orderpriority,\n"
        "  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
        " * 1000000, 0) AS BIGINT)) AS BIGINT) AS revenue_micros\n"
        "FROM customer JOIN orders ON o_custkey = c_custkey\n"
        "JOIN lineitem ON l_orderkey = o_orderkey\n"
        f"WHERE c_mktsegment = '{segment}'\n"
        f"  AND o_orderdate < TIMESTAMP '{date} 00:00:00'\n"
        f"  AND l_shipdate > TIMESTAMP '{date} 00:00:00'\n"
        "GROUP BY o_orderkey, o_orderdate, o_orderpriority\n"
        f"ORDER BY revenue_micros DESC, o_orderkey ASC LIMIT {n}"
    )


def local_supplier_volume_sql(
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> str:
    """Mirror of operators.relational.local_supplier_volume."""
    return (
        "SELECT n_name,\n"
        "  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
        " * 1000000, 0) AS BIGINT)) AS BIGINT) AS revenue_micros\n"
        "FROM region JOIN nation ON n_regionkey = r_regionkey\n"
        "JOIN supplier ON s_nationkey = n_nationkey\n"
        "JOIN customer ON c_nationkey = n_nationkey\n"
        "JOIN orders ON o_custkey = c_custkey\n"
        "JOIN lineitem ON l_orderkey = o_orderkey"
        " AND l_suppkey = s_suppkey\n"
        f"WHERE r_name = '{region_name}'\n"
        f"  AND o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"  AND o_orderdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "GROUP BY n_name"
    )


def boruvka_msf_sql(rounds: int = 10, salt: str = "msf") -> str:
    """Mirror of algos.msf.boruvka_msf over the transcript graph with
    synthesized 1 + hash48(salt:lo:hi) % 10^6 weights: ``rounds``
    unrolled Boruvka rounds (no-ops once the forest is complete), each
    with a min-outgoing-edge pick under the (w, lo, hi) total order and
    a RECURSIVE-CTE component update over the accumulated forest."""
    h = _h48(
        f"'{salt}' || ':' || CAST(least(src, dst) AS VARCHAR) || ':' "
        "|| CAST(greatest(src, dst) AS VARCHAR)"
    )
    parts = [
        "uw AS MATERIALIZED (SELECT lo, hi, CAST(min(wv) AS BIGINT) AS w"
        " FROM (\n"
        "  SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,\n"
        f"    1 + {h} % 1000000 AS wv\n"
        "  FROM edges WHERE src <> dst) GROUP BY lo, hi)",
        "comp0 AS MATERIALIZED (SELECT id, id AS comp FROM vertices)",
        "forest0 AS MATERIALIZED (SELECT lo, hi, w FROM uw WHERE 1 = 0)",
    ]
    for r in range(1, rounds + 1):
        prev = r - 1
        parts.append(
            f"cand{r} AS MATERIALIZED (\n"
            f"  SELECT c1.comp, e.w, e.lo, e.hi\n"
            f"  FROM uw e JOIN comp{prev} c1 ON c1.id = e.lo\n"
            f"  JOIN comp{prev} c2 ON c2.id = e.hi\n"
            f"  WHERE c1.comp <> c2.comp\n"
            f"  UNION ALL\n"
            f"  SELECT c2.comp, e.w, e.lo, e.hi\n"
            f"  FROM uw e JOIN comp{prev} c1 ON c1.id = e.lo\n"
            f"  JOIN comp{prev} c2 ON c2.id = e.hi\n"
            f"  WHERE c1.comp <> c2.comp)"
        )
        parts.append(
            f"chosen{r} AS MATERIALIZED (SELECT DISTINCT lo, hi, w FROM (\n"
            f"  SELECT lo, hi, w, row_number() OVER (PARTITION BY comp\n"
            f"    ORDER BY w, lo, hi) AS rn FROM cand{r}) WHERE rn = 1)"
        )
        parts.append(
            f"forest{r} AS MATERIALIZED (\n"
            f"  SELECT DISTINCT lo, hi, w FROM (\n"
            f"    SELECT * FROM forest{prev}"
            f" UNION ALL SELECT * FROM chosen{r}))"
        )
        parts.append(
            f"fu{r} AS MATERIALIZED (SELECT lo AS a, hi AS b FROM forest{r}\n"
            f"  UNION ALL SELECT hi, lo FROM forest{r})"
        )
        parts.append(
            f"reach{r}(v, s) AS (\n"
            f"  SELECT id, id FROM vertices\n"
            f"  UNION\n"
            f"  SELECT fe.b, q.s FROM reach{r} q JOIN fu{r} fe"
            f" ON fe.a = q.v)"
        )
        parts.append(
            f"comp{r} AS MATERIALIZED (SELECT v AS id, min(s) AS comp"
            f" FROM reach{r} GROUP BY v)"
        )
    joined = ",\n".join(parts)
    body = f", {joined}\nSELECT lo, hi, w FROM forest{rounds}"
    return _graph_query(body, recursive=True)


def single_linkage_sql(
    k: int = 8, rounds: int = 10, salt: str = "msf"
) -> str:
    """Mirror of algos.msf.single_linkage_clusters over the same
    synthesized-weight transcript graph as boruvka_msf_sql: drop the
    k−1 heaviest forest edges (w DESC, lo DESC, hi DESC), then a
    recursive-CTE CC over the kept forest."""
    base = boruvka_msf_sql(rounds, salt)
    # reuse the full boruvka WITH-chain; replace its final SELECT
    final = f"SELECT lo, hi, w FROM forest{rounds}"
    assert base.endswith(final)
    body = base[: -len(final)].rstrip() + ",\n"
    return (
        body
        + f"heavy AS MATERIALIZED (SELECT lo, hi FROM forest{rounds}\n"
        f"  ORDER BY w DESC, lo DESC, hi DESC LIMIT {max(0, k - 1)}),\n"
        f"kept AS MATERIALIZED (SELECT f.lo, f.hi FROM forest{rounds} f\n"
        "  LEFT JOIN heavy h ON h.lo = f.lo AND h.hi = f.hi\n"
        "  WHERE h.lo IS NULL),\n"
        "ku AS MATERIALIZED (SELECT lo AS a, hi AS b FROM kept\n"
        "  UNION ALL SELECT hi, lo FROM kept),\n"
        "kreach(v, s) AS (\n"
        "  SELECT id, id FROM vertices\n"
        "  UNION\n"
        "  SELECT fe.b, q.s FROM kreach q JOIN ku fe ON fe.a = q.v)\n"
        "SELECT v AS id, CAST(min(s) AS BIGINT) AS cluster"
        " FROM kreach GROUP BY v"
    )


def triad_census_sql(loop_closure: bool = True) -> str:
    """Mirror of algos.triangles.directed_triangle_census over the
    directed edge set plus the per-conversation loop-closure edges (the
    scc entry's convention — the raw graph is a DAG, cyclic would be
    trivially 0 without them): cyclic anchored at the minimum vertex,
    transitive counted by its unique source/middle/sink roles."""
    closure = (
        "  UNION ALL\n"
        "  SELECT max(id) AS src, min(id) AS dst FROM vertices"
        " GROUP BY conv_id HAVING max(id) <> min(id)\n"
        if loop_closure
        else ""
    )
    return _graph_query(
        ", darc AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM edges\n"
        f"{closure}"
        ") WHERE src <> dst),\n"
        "cyc AS MATERIALIZED (SELECT count(*) AS n FROM darc e1\n"
        "  JOIN darc e2 ON e2.src = e1.dst\n"
        "  JOIN darc e3 ON e3.src = e2.dst AND e3.dst = e1.src\n"
        "  WHERE e1.src < e1.dst AND e1.src < e2.dst),\n"
        "tr AS MATERIALIZED (SELECT count(*) AS n FROM darc e1\n"
        "  JOIN darc e2 ON e2.src = e1.dst\n"
        "  JOIN darc e3 ON e3.src = e1.src AND e3.dst = e2.dst)\n"
        "SELECT CAST(cyc.n AS BIGINT) AS n_cyclic,\n"
        "  CAST(tr.n AS BIGINT) AS n_transitive FROM cyc, tr"
    )


def transitivity_sql() -> str:
    """Mirror of algos.stats.transitivity: 3·T / W with the triangle
    count from the shared tri CTE (a DIFFERENT enumeration from the
    Spark side's degree-oriented one — counts must agree regardless)
    and wedges from the undirected degree table."""
    return _graph_query(
        f", {_TRI_CTES},\n"
        "udeg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM und"
        " GROUP BY src),\n"
        "wx AS MATERIALIZED (SELECT COALESCE(sum(d * (d - 1)), 0) // 2"
        " AS w FROM udeg),\n"
        "tc AS MATERIALIZED (SELECT count(*) AS t FROM tri)\n"
        "SELECT CAST(t AS BIGINT) AS n_triangles,"
        " CAST(w AS BIGINT) AS n_wedges,\n"
        "  CASE WHEN w > 0 THEN round(3.0 * t / w, 6) END AS transitivity\n"
        "FROM tc, wx"
    )


def powerlaw_alpha_sql(dmin: int = 2) -> str:
    """Mirror of algos.stats.powerlaw_alpha: per-vertex micro-unit
    rounding of each log term BEFORE the exact BIGINT sum, one float
    division at the end."""
    return _graph_query(
        ", udeg AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM und"
        " GROUP BY src),\n"
        "terms AS MATERIALIZED (SELECT CAST(round(ln(d * 1.0 /"
        f" {dmin - 0.5}) * 1000000, 0) AS BIGINT) AS lt\n"
        f"  FROM udeg WHERE d >= {dmin})\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_tail,\n"
        "  CASE WHEN COALESCE(sum(lt), 0) > 0 THEN\n"
        "    round(1.0 + count(*) * 1000000.0 / sum(lt), 6) END AS alpha\n"
        "FROM terms"
    )


def _wl_parts(iterations: int) -> str:
    """The unrolled 1-WL refinement CTE chain (w0..w<iterations>) —
    the identical ``wl:<own>:<sorted neighbor colors>`` hash string as
    algos.wl.wl_refinement."""
    parts = [
        "w0 AS MATERIALIZED (SELECT id, "
        + _h48("'wl:0'")
        + " AS color FROM vertices)"
    ]
    for r in range(1, iterations + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"wn{r} AS MATERIALIZED (\n"
            f"  SELECT u.dst AS id,\n"
            f"    string_agg(CAST(c.color AS VARCHAR), ',' ORDER BY c.color)"
            f" AS nbrs\n"
            f"  FROM und u JOIN {prev} c ON c.id = u.src\n"
            f"  GROUP BY u.dst)"
        )
        parts.append(
            f"w{r} AS MATERIALIZED (\n"
            f"  SELECT v.id, "
            + _h48(
                "'wl:' || CAST(v.color AS VARCHAR) || ':' || "
                "COALESCE(n.nbrs, '')"
            )
            + " AS color\n"
            f"  FROM {prev} v LEFT JOIN wn{r} n ON n.id = v.id)"
        )
    return ",\n".join(parts)


def wl_sql(iterations: int = 3) -> str:
    """Mirror of algos.wl.wl_refinement."""
    body = (
        f", {_wl_parts(iterations)}\n"
        f"SELECT id, color FROM w{iterations}"
    )
    return _graph_query(body)


def wl_conv_fingerprints_sql(iterations: int = 3) -> str:
    """Mirror of algos.wl.wl_conv_fingerprints: md5 of the ascending
    per-conversation WL color list, plus the duplicate-class size."""
    body = (
        f", {_wl_parts(iterations)},\n"
        "pc AS MATERIALIZED (\n"
        "  SELECT v.conv_id, CAST(count(*) AS BIGINT) AS n_vertices,\n"
        "    md5(string_agg(CAST(c.color AS VARCHAR), ','"
        " ORDER BY c.color)) AS fingerprint\n"
        f"  FROM w{iterations} c JOIN vertices v ON v.id = c.id\n"
        "  GROUP BY v.conv_id)\n"
        "SELECT conv_id, n_vertices, fingerprint, class_size\n"
        "FROM pc JOIN (SELECT fingerprint,"
        " CAST(count(*) AS BIGINT) AS class_size\n"
        "  FROM pc GROUP BY fingerprint) cs USING (fingerprint)"
    )
    return _graph_query(body)


def negative_edges_sql(k: int = 3, salt: str = "neg") -> str:
    """Mirror of algos.sampling.negative_edges: hash-mod candidates
    over the dense id space, collision slots dropped via NOT EXISTS."""
    slots = ", ".join(f"({i})" for i in range(k))
    h = _h48(
        f"concat_ws(':', '{salt}', CAST(src AS VARCHAR),"
        " CAST(dst AS VARCHAR), CAST(t.i AS VARCHAR))"
    )
    body = (
        ", vc AS (SELECT CAST(count(*) AS BIGINT) AS n_v"
        " FROM vertices),\n"
        "cands AS MATERIALIZED (\n"
        f"  SELECT src, dst, t.i AS slot, {h} % n_v AS neg_dst\n"
        f"  FROM edges, vc, (VALUES {slots}) AS t(i))\n"
        "SELECT src, dst, slot, neg_dst FROM cands c\n"
        "WHERE neg_dst <> src AND NOT EXISTS (\n"
        "  SELECT 1 FROM und u WHERE u.src = c.src"
        " AND u.dst = c.neg_dst)"
    )
    return _graph_query(body)


def rectangles_sql() -> str:
    """Mirror of algos.triangles.rectangle_count: R = Σ C(cn,2) / 2 in
    integer arithmetic."""
    body = (
        ", cnp AS MATERIALIZED (\n"
        "  SELECT e1.dst AS u, e2.dst AS v, count(*) AS c\n"
        "  FROM und e1 JOIN und e2 ON e2.src = e1.src AND e1.dst < e2.dst\n"
        "  GROUP BY e1.dst, e2.dst)\n"
        "SELECT CAST(COALESCE(SUM((c * (c - 1)) // 2) // 2, 0) AS BIGINT)"
        " AS rectangles\nFROM cnp"
    )
    return _graph_query(body)


def scc_sql(loop_closure: bool = True) -> str:
    """Exact SCC labels via DuckDB's recursive transitive closure:
    scc(v) = min{u : u ⇝ v AND v ⇝ u} over the DIRECTED edge set (self
    included, so every vertex gets a label ≤ its own id).  Deliberately
    a different algorithm from the Spark side's FW/BW min-label peel
    (algos/scc.py) — the closure is the definition, tractable only at
    test scale (Σ|SCC-closure| pairs; ~0.7M at sf0.01 with loop
    closure).  ``loop_closure`` adds the same last→first per-conversation
    edge as the entry query so cycle collapse is actually exercised
    (the raw transcript graph is a DAG — every SCC a singleton)."""
    closure = (
        "    UNION ALL\n"
        "    SELECT max(id) AS src, min(id) AS dst FROM vertices"
        " GROUP BY conv_id\n"
        if loop_closure
        else ""
    )
    body = (
        ", dedges AS MATERIALIZED (\n"
        "  SELECT DISTINCT src, dst FROM (\n"
        "    SELECT src, dst FROM edges\n"
        f"{closure}"
        "  ) u WHERE src <> dst),\n"
        "fw(v, r) AS (\n"
        "  SELECT id, id FROM vertices\n"
        "  UNION\n"
        "  SELECT e.dst, fw.r FROM fw JOIN dedges e ON e.src = fw.v)\n"
        "SELECT f.v AS id, CAST(min(f.r) AS BIGINT) AS scc\n"
        "FROM fw f JOIN fw g ON g.v = f.r AND g.r = f.v\n"
        "GROUP BY f.v"
    )
    return _graph_query(body, recursive=True)


def ktruss_sql(k: int = 3, max_rounds: int = 8) -> str:
    """Unrolled k-truss peel — identical round rule + cap as
    algos.triangles.k_truss, so SQL/Spark equality holds whether or not
    the cap binds (the peel is monotone: rounds past the fixpoint are
    no-ops on both sides).  Triangles are enumerated with the id
    orientation; the Spark side's degree orientation yields the identical
    triangle set."""
    parts = [
        "te0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, "
        "greatest(src, dst) AS b FROM edges WHERE src <> dst)"
    ]
    for r in range(1, max_rounds + 1):
        prev = f"te{r - 1}"
        parts.append(
            f"tr{r} AS MATERIALIZED (\n"
            f"  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3\n"
            f"  FROM {prev} e1\n"
            f"  JOIN {prev} e2 ON e2.a = e1.a AND e1.b < e2.b\n"
            f"  JOIN {prev} e3 ON e3.a = e1.b AND e3.b = e2.b)"
        )
        parts.append(
            f"te{r} AS MATERIALIZED (\n"
            f"  SELECT e.a, e.b FROM {prev} e JOIN (\n"
            f"    SELECT a, b, count(*) AS c FROM (\n"
            f"      SELECT v1 AS a, v2 AS b FROM tr{r}\n"
            f"      UNION ALL SELECT v1, v3 FROM tr{r}\n"
            f"      UNION ALL SELECT v2, v3 FROM tr{r})\n"
            f"    GROUP BY a, b) s\n"
            f"  ON s.a = e.a AND s.b = e.b AND s.c >= {k - 2})"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT e.a AS lo, e.b AS hi, t.a IS NOT NULL AS in_truss\n"
        f"FROM te0 e LEFT JOIN te{max_rounds} t ON t.a = e.a AND t.b = e.b"
    )
    return _graph_query(body)


def katz_sql(iterations: int = 6, alpha_den: int = 8) -> str:
    """Unrolled Katz fixed-point — identical integer micro-unit rule as
    algos.centrality.katz_centrality (per-term `div`, then exact sum)."""
    parts = [
        "k0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS katz "
        "FROM vertices)"
    ]
    for r in range(1, iterations + 1):
        prev = f"k{r - 1}"
        parts.append(
            f"k{r} AS MATERIALIZED (\n"
            f"  SELECT v.id,\n"
            f"    CAST(1000000 + COALESCE(m.s, 0) AS BIGINT) AS katz\n"
            f"  FROM {prev} v LEFT JOIN (\n"
            f"    SELECT e.dst AS id, SUM(p.katz // {alpha_den}) AS s\n"
            f"    FROM edges e JOIN {prev} p ON p.id = e.src\n"
            f"    GROUP BY e.dst) m ON m.id = v.id)"
        )
    joined = ",\n".join(parts)
    body = f", {joined}\nSELECT id, katz FROM k{iterations}"
    return _graph_query(body)


def lt_cascade_sql(rounds: int = 6, seed_mod: int = 8) -> str:
    """Unrolled Linear-Threshold cascade — identical hash-derived
    thresholds/seeds and the identical exact-integer activation test
    (active_nbrs * 1e6 >= theta_micros * deg) as algos.cascade.lt_cascade;
    frontier-incremental accumulator recurrence mirrored round by round."""
    h_theta = _h48("'lt:' || CAST(v.id AS VARCHAR)")
    h_seed = _h48("'ltseed:' || CAST(v.id AS VARCHAR)")
    theta = f"1 + {h_theta} % 1000000"
    seed = f"{h_seed} % {seed_mod} = 0"
    parts = [
        "udeg AS MATERIALIZED (SELECT src AS id, count(*) AS deg "
        "FROM und GROUP BY src)",
        f"lt0 AS MATERIALIZED (\n"
        f"  SELECT v.id, CAST({theta} AS BIGINT) AS theta,\n"
        f"    CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,\n"
        f"    CASE WHEN {seed} THEN CAST(0 AS BIGINT) END AS rnd,\n"
        f"    CAST(0 AS BIGINT) AS acc\n"
        f"  FROM vertices v LEFT JOIN udeg d ON d.id = v.id)",
    ]
    for r in range(1, rounds + 1):
        prev = f"lt{r - 1}"
        parts.append(
            f"lt{r} AS MATERIALIZED (\n"
            f"  SELECT s.id, s.theta, s.deg,\n"
            f"    CASE WHEN s.rnd IS NOT NULL THEN s.rnd\n"
            f"         WHEN s.deg > 0 AND (s.acc + COALESCE(i.c, 0)) * 1000000\n"
            f"              >= s.theta * s.deg THEN CAST({r} AS BIGINT)\n"
            f"         END AS rnd,\n"
            f"    s.acc + COALESCE(i.c, 0) AS acc\n"
            f"  FROM {prev} s LEFT JOIN (\n"
            f"    SELECT u.dst AS id, count(*) AS c\n"
            f"    FROM und u JOIN {prev} f ON f.id = u.src AND f.rnd = {r - 1}\n"
            f"    GROUP BY u.dst) i ON i.id = s.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, theta AS theta_micros, deg,\n"
        f"  CAST(COALESCE(rnd, -1) AS BIGINT) AS active_round\n"
        f"FROM lt{rounds}"
    )
    return _graph_query(body)


def ic_cascade_sql(
    rounds: int = 6, p_micros: int = 300000, seed_mod: int = 8
) -> str:
    """Unrolled Independent Cascade — identical hash live-arc predicate,
    seeds and multi-source-BFS rounds as algos.cascade.ic_cascade."""
    h_live = _h48(
        "concat_ws(chr(31), 'ic', CAST(src AS VARCHAR), CAST(dst AS VARCHAR))"
    )
    h_seed = _h48("concat_ws(chr(31), 'icseed', CAST(id AS VARCHAR))")
    parts = [
        f"live AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges\n"
        f"  WHERE {h_live} % 1000000 < {p_micros})",
        f"ic0 AS MATERIALIZED (\n"
        f"  SELECT id, CASE WHEN {h_seed} % {seed_mod} = 0\n"
        f"    THEN CAST(0 AS BIGINT) END AS rnd\n"
        f"  FROM vertices)",
    ]
    for r in range(1, rounds + 1):
        prev = f"ic{r - 1}"
        parts.append(
            f"ic{r} AS MATERIALIZED (\n"
            f"  SELECT s.id,\n"
            f"    CASE WHEN s.rnd IS NOT NULL THEN s.rnd\n"
            f"         WHEN m.id IS NOT NULL THEN CAST({r} AS BIGINT)\n"
            f"         END AS rnd\n"
            f"  FROM {prev} s LEFT JOIN (\n"
            f"    SELECT DISTINCT l.dst AS id\n"
            f"    FROM live l JOIN {prev} f ON f.id = l.src AND f.rnd = {r - 1}\n"
            f"    ) m ON m.id = s.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, CAST(COALESCE(rnd, -1) AS BIGINT) AS active_round\n"
        f"FROM ic{rounds}"
    )
    return _graph_query(body)


def densest_peel_sql(rounds: int = 8, eps_permille: int = 100) -> str:
    """Unrolled BKV densest-subgraph peel — identical cross-multiplied
    integer removal test and exact micro-division density as
    algos.densest.densest_subgraph_peel."""
    thresh = 2 * (1000 + eps_permille)
    parts = ["dsp0 AS MATERIALIZED (SELECT id FROM vertices)"]
    for r in range(rounds + 1):
        parts.append(
            f"dse{r} AS MATERIALIZED (\n"
            f"  SELECT u.src AS lo, u.dst AS hi FROM und u\n"
            f"  JOIN dsp{r} a ON a.id = u.src\n"
            f"  JOIN dsp{r} b ON b.id = u.dst\n"
            f"  WHERE u.src < u.dst)"
        )
        parts.append(
            f"dst{r} AS MATERIALIZED (\n"
            f"  SELECT CAST((SELECT count(*) FROM dsp{r}) AS BIGINT) AS v_t,\n"
            f"         CAST((SELECT count(*) FROM dse{r}) AS BIGINT) AS e_t)"
        )
        if r == rounds:
            break
        parts.append(
            f"dsp{r + 1} AS MATERIALIZED (\n"
            f"  SELECT a.id FROM dsp{r} a\n"
            f"  LEFT JOIN (SELECT v, count(*) AS c FROM (\n"
            f"      SELECT lo AS v FROM dse{r}\n"
            f"      UNION ALL SELECT hi AS v FROM dse{r}) GROUP BY v) d\n"
            f"    ON d.v = a.id, dst{r} s\n"
            f"  WHERE COALESCE(d.c, 0) * s.v_t * 1000 > {thresh} * s.e_t)"
        )
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, v_t AS n_vertices,\n"
        f"  e_t AS n_edges, (1000000 * e_t) // v_t AS density_ppm\n"
        f"FROM dst{r} WHERE v_t > 0"
        for r in range(rounds + 1)
    )
    joined = ",\n".join(parts)
    return _graph_query(f", {joined}\n{rows}")


def _anf_parts(max_h: int, k: int) -> tuple[str, str]:
    """(joined CTE chain, per-h estimate UNION) of the unrolled KMV-ANF —
    shared by neighborhood_function_sql and effective_diameter_sql."""
    mult = (k - 1) * (1 << 48)
    parts = [
        "nf0 AS MATERIALIZED (SELECT id, "
        + _h48("'nf:' || CAST(id AS VARCHAR)")
        + " AS hv FROM vertices)"
    ]
    for r in range(1, max_h + 1):
        prev = f"nf{r - 1}"
        parts.append(
            f"nfu{r} AS MATERIALIZED (\n"
            f"  SELECT DISTINCT id, hv FROM (\n"
            f"    SELECT u.dst AS id, s.hv FROM und u JOIN {prev} s ON s.id = u.src\n"
            f"    UNION ALL SELECT id, hv FROM {prev}))"
        )
        parts.append(
            f"nf{r} AS MATERIALIZED (\n"
            f"  SELECT id, hv FROM (\n"
            f"    SELECT id, hv, row_number() OVER (PARTITION BY id ORDER BY hv) AS rn\n"
            f"    FROM nfu{r})\n"
            f"  WHERE rn <= {k})"
        )
    ests = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS h, CAST(SUM(CASE WHEN n < {k} THEN n "
        f"ELSE {mult} // hk END) AS BIGINT) AS est_pairs FROM "
        f"(SELECT id, count(*) AS n, max(hv) AS hk FROM nf{r} GROUP BY id)"
        for r in range(0, max_h + 1)
    )
    return ",\n".join(parts), ests


def neighborhood_function_sql(max_h: int = 8, k: int = 8) -> str:
    """Unrolled KMV-ANF — identical sketch rule (k smallest md5 hashes of
    the ball, merged through neighbors each iteration) and the identical
    integer estimate as algos.anf.neighborhood_function."""
    joined, ests = _anf_parts(max_h, k)
    body = f", {joined}\n{ests}"
    return _graph_query(body)


def effective_diameter_sql(
    max_h: int = 8, k: int = 8, permille: int = 900
) -> str:
    """Mirror of algos.anf.effective_diameter: smallest h whose KMV-ANF
    estimate reaches permille/1000 of NF(max_h) — integer threshold
    comparison, no float anywhere."""
    joined, ests = _anf_parts(max_h, k)
    body = (
        f", {joined},\n"
        f"nf_all AS MATERIALIZED ({ests}),\n"
        f"mx AS MATERIALIZED (SELECT est_pairs AS nf_max FROM nf_all"
        f" WHERE h = {max_h})\n"
        f"SELECT CAST(min(h) AS BIGINT) AS eff_diameter,\n"
        f"       CAST(max(nf_max) AS BIGINT) AS nf_max\n"
        f"FROM nf_all, mx WHERE est_pairs * 1000 >= {permille} * nf_max"
    )
    return _graph_query(body)


def rich_club_sql(ks: tuple[int, ...] = (1, 2, 4, 8)) -> str:
    """Mirror of algos.stats.rich_club over the transcript graph's
    undirected closure: exact club sizes / among-club edge counts
    (directed representations halved with integer div), one float
    division for phi (6dp), zeros when a club is empty."""
    vals = ", ".join(f"({int(x)})" for x in sorted(ks))
    body = (
        ", udeg AS MATERIALIZED (SELECT src AS id, count(*) AS d"
        " FROM und GROUP BY src),\n"
        f"ks AS MATERIALIZED (SELECT k FROM (VALUES {vals}) t(k)),\n"
        "nk AS MATERIALIZED (SELECT k, count(*) AS n_nodes FROM ks\n"
        "  JOIN udeg ON udeg.d > ks.k GROUP BY k),\n"
        "rr AS MATERIALIZED (SELECT k, count(*) AS reps FROM ks JOIN (\n"
        "    SELECT a.d AS ds, b.d AS dd FROM und u\n"
        "    JOIN udeg a ON a.id = u.src JOIN udeg b ON b.id = u.dst) e\n"
        "  ON e.ds > ks.k AND e.dd > ks.k GROUP BY k)\n"
        "SELECT CAST(ks.k AS BIGINT) AS k,\n"
        "  CAST(coalesce(n_nodes, 0) AS BIGINT) AS n_nodes,\n"
        "  CAST(coalesce(reps, 0) // 2 AS BIGINT) AS e_among,\n"
        "  CASE WHEN coalesce(n_nodes, 0) >= 2 THEN\n"
        "    round(coalesce(reps, 0) * 1.0 /\n"
        "          (n_nodes * (n_nodes - 1.0)), 6) END AS phi\n"
        "FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN rr ON rr.k = ks.k"
    )
    return _graph_query(body)


def reciprocity_sql() -> str:
    """Mirror of algos.stats.reciprocity over the (unsparsified) user
    contact graph: distinct directed contacts, self-loops dropped; a
    reverse-key self-join counts reciprocated edges; one 6dp float
    division."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src, user_id AS dst\n"
        "  FROM ev) WHERE src IS NOT NULL AND src <> dst)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_edges,\n"
        "  CAST(count(r.src) AS BIGINT) AS n_recip,\n"
        "  round(count(r.src) * 1.0 / count(*), 6) AS reciprocity\n"
        "FROM ce LEFT JOIN ce r ON r.src = ce.dst AND r.dst = ce.src"
    )


_MIS_PRI_CTE = (
    "pri AS MATERIALIZED (SELECT id, "
    + _h48("'mis:' || CAST(id AS VARCHAR)")
    + " AS h FROM vertices)"
)


def mis_sql(max_rounds: int = 32) -> str:
    """Unrolled Luby MIS — identical priority (hash48('mis:'||id), id
    tie-break), round rule and cap as algos.mis.maximal_independent_set;
    rounds past the fixpoint are no-ops on both sides."""
    parts = [
        _MIS_PRI_CTE,
        "s0 AS MATERIALIZED (SELECT id, h, -1 AS st FROM pri)",
    ]
    for r in range(1, max_rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"sel{r} AS MATERIALIZED (\n"
            f"  SELECT v.id FROM {prev} v\n"
            f"  WHERE v.st = -1 AND NOT EXISTS (\n"
            f"    SELECT 1 FROM und u JOIN {prev} w ON w.id = u.src\n"
            f"    WHERE u.dst = v.id AND w.st = -1\n"
            f"      AND (w.h < v.h OR (w.h = v.h AND w.id < v.id))))"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (\n"
            f"  SELECT v.id, v.h,\n"
            f"    CASE WHEN v.st <> -1 THEN v.st\n"
            f"         WHEN sl.id IS NOT NULL THEN 1\n"
            f"         WHEN nb.id IS NOT NULL THEN 0\n"
            f"         ELSE -1 END AS st\n"
            f"  FROM {prev} v\n"
            f"  LEFT JOIN sel{r} sl ON sl.id = v.id\n"
            f"  LEFT JOIN (SELECT DISTINCT u.dst AS id FROM und u\n"
            f"             JOIN sel{r} x ON x.id = u.src) nb ON nb.id = v.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, CAST(st AS BIGINT) AS status FROM s{max_rounds}"
    )
    return _graph_query(body)


def coloring_sql(max_rounds: int = 32) -> str:
    """Unrolled Jones–Plassmann coloring — identical priority, color-mask
    ladder (the SAME generated CASE string the Spark side evaluates) and
    cap as algos.mis.greedy_coloring."""
    from graphlite_spark.algos.mis import lowest_missing_color_sql

    ladder = lowest_missing_color_sql("COALESCE(a.mask, 0)")
    parts = [
        _MIS_PRI_CTE,
        "g0 AS MATERIALIZED (SELECT id, h, -1 AS color FROM pri)",
    ]
    for r in range(1, max_rounds + 1):
        prev = f"g{r - 1}"
        parts.append(
            f"a{r} AS MATERIALIZED (\n"
            f"  SELECT u.dst AS id,\n"
            f"    bool_or(w.color = -1 AND (w.h > v.h OR (w.h = v.h AND w.id > v.id))) AS has_higher,\n"
            f"    bit_or(CASE WHEN w.color >= 0 THEN (CAST(1 AS BIGINT) << w.color) END) AS mask\n"
            f"  FROM und u JOIN {prev} w ON w.id = u.src\n"
            f"  JOIN {prev} v ON v.id = u.dst\n"
            f"  GROUP BY u.dst)"
        )
        parts.append(
            f"g{r} AS MATERIALIZED (\n"
            f"  SELECT v.id, v.h,\n"
            f"    CASE WHEN v.color >= 0 THEN v.color\n"
            f"         WHEN NOT COALESCE(a.has_higher, FALSE) THEN {ladder}\n"
            f"         ELSE -1 END AS color\n"
            f"  FROM {prev} v LEFT JOIN a{r} a ON a.id = v.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        f"SELECT id, CAST(color AS BIGINT) AS color FROM g{max_rounds}"
    )
    return _graph_query(body)


def matching_sql(max_rounds: int = 16) -> str:
    """Unrolled greedy maximal matching — identical edge priority
    (hash48('match:'||u||':'||v), (u, v) tie-break), round rule and cap
    as algos.matching.maximal_matching; rounds past the drained edge set
    are no-ops on both sides.  Per-endpoint minima via row_number over
    the unique (h, u, v) key, so every step is a window or an equi-join
    (no quadratic NOT EXISTS)."""
    pri = _h48("'match:' || CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)")
    parts = [
        "l0 AS MATERIALIZED (SELECT u, v, " + pri + " AS h FROM ("
        "SELECT src AS u, dst AS v FROM und WHERE src < dst))",
    ]
    for r in range(1, max_rounds + 1):
        prev = f"l{r - 1}"
        parts.append(
            f"ends{r} AS MATERIALIZED (\n"
            f"  SELECT u AS vid, h, u, v FROM {prev}\n"
            f"  UNION ALL SELECT v AS vid, h, u, v FROM {prev})"
        )
        parts.append(
            f"vmin{r} AS MATERIALIZED (\n"
            f"  SELECT vid, u, v FROM (\n"
            f"    SELECT vid, u, v,\n"
            f"      row_number() OVER (PARTITION BY vid ORDER BY h, u, v) AS rn\n"
            f"    FROM ends{r}) WHERE rn = 1)"
        )
        parts.append(
            f"sel{r} AS MATERIALIZED (\n"
            f"  SELECT e.u, e.v FROM {prev} e\n"
            f"  JOIN vmin{r} a ON a.vid = e.u AND a.u = e.u AND a.v = e.v\n"
            f"  JOIN vmin{r} b ON b.vid = e.v AND b.u = e.u AND b.v = e.v)"
        )
        parts.append(
            f"m{r} AS MATERIALIZED (\n"
            f"  SELECT u AS id FROM sel{r} UNION ALL SELECT v AS id FROM sel{r})"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (\n"
            f"  SELECT e.u, e.v, e.h FROM {prev} e\n"
            f"  LEFT JOIN m{r} a ON a.id = e.u\n"
            f"  LEFT JOIN m{r} b ON b.id = e.v\n"
            f"  WHERE a.id IS NULL AND b.id IS NULL)"
        )
    matched = "\n  UNION ALL ".join(
        f"SELECT u AS id, v AS mate FROM sel{r}\n"
        f"  UNION ALL SELECT v AS id, u AS mate FROM sel{r}"
        for r in range(1, max_rounds + 1)
    )
    joined = ",\n".join(parts)
    body = (
        f", {joined},\n"
        f"matched AS MATERIALIZED (\n  {matched})\n"
        "SELECT v.id, CAST(COALESCE(m.mate, -1) AS BIGINT) AS mate\n"
        "FROM vertices v LEFT JOIN matched m ON m.id = v.id"
    )
    return _graph_query(body)


def lcc_sql() -> str:
    """Local clustering coefficient: per-vertex triangles + undirected
    degree, ``2T/(d(d-1))`` rounded to 6dp (single double division on
    exact integers — engine-stable)."""
    body = (
        f", {_TRI_CTES},\n"
        "tpv AS MATERIALIZED (\n"
        "  SELECT v.id, count(x.v) AS t\n"
        "  FROM vertices v LEFT JOIN (\n"
        "    SELECT unnest([v1, v2, v3]) AS v FROM tri) x ON x.v = v.id\n"
        "  GROUP BY v.id),\n"
        "ud AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM und GROUP BY src)\n"
        "SELECT t.id, CAST(COALESCE(u.deg, 0) AS BIGINT) AS degree,\n"
        "  CAST(t.t AS BIGINT) AS triangles,\n"
        "  CASE WHEN COALESCE(u.deg, 0) >= 2\n"
        "       THEN round(2.0 * t.t / (u.deg * (u.deg - 1)), 6)\n"
        "       ELSE 0.0 END AS lcc\n"
        "FROM tpv t LEFT JOIN ud u ON u.id = t.id"
    )
    return _graph_query(body)


def adamic_adar_sql(
    max_wedge_degree: int | None = 100, min_score_micros: int = 1_000_000
) -> str:
    """Mirror of algos.linkpred.adamic_adar: wedge join through non-hub
    centers, integer micro-unit weights (round(1e6/ln(deg)) as BIGINT),
    existing edges anti-joined out."""
    cap = (
        f"AND deg <= {max_wedge_degree}" if max_wedge_degree is not None else ""
    )
    body = (
        ", wdeg AS MATERIALIZED (SELECT src AS w, count(*) AS deg FROM und GROUP BY src),\n"
        "ctr AS MATERIALIZED (\n"
        "  SELECT w, CAST(round(1000000.0 / ln(deg)) AS BIGINT) AS wt\n"
        f"  FROM wdeg WHERE deg >= 2 {cap}),\n"
        "wedge AS MATERIALIZED (\n"
        "  SELECT e1.dst AS u, e2.dst AS v, c.wt\n"
        "  FROM und e1 JOIN und e2 ON e2.src = e1.src AND e1.dst < e2.dst\n"
        "  JOIN ctr c ON c.w = e1.src),\n"
        "pairs AS MATERIALIZED (\n"
        "  SELECT u, v, CAST(sum(wt) AS BIGINT) AS aa_micros\n"
        "  FROM wedge GROUP BY u, v)\n"
        "SELECT p.u, p.v, p.aa_micros FROM pairs p\n"
        "LEFT JOIN (SELECT src AS u, dst AS v FROM und WHERE src < dst) ex\n"
        "  ON ex.u = p.u AND ex.v = p.v\n"
        f"WHERE ex.u IS NULL AND p.aa_micros >= {min_score_micros}"
    )
    return _graph_query(body)


def jaccard_linkpred_sql(
    max_wedge_degree: int | None = 100, min_score_micros: int = 100_000
) -> str:
    """Mirror of algos.linkpred.jaccard_similarity: common-neighbor count
    through non-hub centers, exact full-graph degrees in the union-size
    denominator, one integer division in micro-units."""
    cap = (
        f"AND deg <= {max_wedge_degree}" if max_wedge_degree is not None else ""
    )
    body = (
        ", wdeg AS MATERIALIZED (SELECT src, count(*) AS deg"
        " FROM und GROUP BY src),\n"
        "ctr AS MATERIALIZED (\n"
        f"  SELECT src AS w FROM wdeg WHERE deg >= 2 {cap}),\n"
        "pairs AS MATERIALIZED (\n"
        "  SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn\n"
        "  FROM und e1 JOIN und e2 ON e2.src = e1.src AND e1.dst < e2.dst\n"
        "  JOIN ctr c ON c.w = e1.src\n"
        "  GROUP BY e1.dst, e2.dst)\n"
        "SELECT p.u, p.v, p.cn,\n"
        "  CAST((1000000 * p.cn) // (a.deg + b.deg - p.cn) AS BIGINT)"
        " AS jaccard_micros\n"
        "FROM pairs p\n"
        "JOIN wdeg a ON a.src = p.u\n"
        "JOIN wdeg b ON b.src = p.v\n"
        "LEFT JOIN (SELECT src AS u, dst AS v FROM und WHERE src < dst) ex\n"
        "  ON ex.u = p.u AND ex.v = p.v\n"
        "WHERE ex.u IS NULL\n"
        f"  AND (1000000 * p.cn) // (a.deg + b.deg - p.cn)"
        f" >= {min_score_micros}"
    )
    return _graph_query(body)


def kmv_distinct_sql(group_col: str = "event_type",
                     value_col: str = "user_id", k: int = 64) -> str:
    """Mirror of operators.sketches.kmv_distinct_by over the events table:
    the KMV estimate is computed in integer arithmetic over the shared
    48-bit md5 hash, so it is hash-exact across engines."""
    mult = (k - 1) * (1 << 48)
    return (
        "WITH hx AS MATERIALIZED (\n"
        f"  SELECT DISTINCT {group_col},\n"
        f"    {_h48(f'CAST({value_col} AS VARCHAR)')} AS h\n"
        "  FROM events),\n"
        "tk AS MATERIALIZED (\n"
        f"  SELECT {group_col}, h,\n"
        f"    row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn\n"
        "  FROM hx),\n"
        f"ag AS (SELECT {group_col}, count(*) AS n, max(h) AS hk\n"
        f"  FROM tk WHERE rn <= {k} GROUP BY {group_col}),\n"
        f"ex AS (SELECT {group_col}, count(*) AS exact_distinct\n"
        f"  FROM hx GROUP BY {group_col})\n"
        f"SELECT a.{group_col},\n"
        f"  CAST(CASE WHEN a.n < {k} THEN a.n ELSE {mult} // a.hk END AS BIGINT)\n"
        "    AS est_distinct,\n"
        "  CAST(e.exact_distinct AS BIGINT) AS exact_distinct\n"
        f"FROM ag a JOIN ex e USING ({group_col})"
    )


def profile_columns_sql(
    table: str = "events",
    numeric: tuple = ("event_id", "user_id", "value"),
    string: tuple = ("event_type", "props"),
    timestamp: tuple = ("ts",),
) -> str:
    """Mirror of operators.profiling.profile_columns: one UNION ALL arm
    per column (test scale; the Spark side melts instead), numerics in
    BIGINT micros, timestamps in epoch micros, strings lexicographic."""
    arms = []
    kinds = (
        [(c, "num") for c in numeric]
        + [(c, "str") for c in string]
        + [(c, "ts") for c in timestamp]
    )
    for c, kind in kinds:
        if kind == "num":
            vn = f"CAST(round(CAST({c} AS DOUBLE) * 1000000, 0) AS BIGINT)"
        elif kind == "ts":
            vn = f"CAST(epoch_us({c}) AS BIGINT)"
        else:
            vn = None
        if vn is not None:
            dis = f"count(DISTINCT {vn})"
            mn, mx = f"min({vn})", f"max({vn})"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            dis = f"count(DISTINCT {c})"
            mn, mx = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
            ms, xs = f"min({c})", f"max({c})"
        arms.append(
            f"SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n_rows,\n"
            f"  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_null,\n"
            f"  CAST({dis} AS BIGINT) AS n_distinct,\n"
            f"  CAST({mn} AS BIGINT) AS min_num,"
            f" CAST({mx} AS BIGINT) AS max_num,\n"
            f"  {ms} AS min_str, {xs} AS max_str\n"
            f"FROM {table}"
        )
    return "\nUNION ALL\n".join(arms)


def tool_cooccurrence_pmi_sql() -> str:
    """Mirror of sources.transcripts.tool_cooccurrence_pmi: exact-int
    counts, one ln of the one-division ratio, rounded 6dp."""
    body = (
        ", pres AS MATERIALIZED (\n"
        "  SELECT DISTINCT conv_id, tool FROM transcripts\n"
        "  WHERE tool IS NOT NULL),\n"
        "nv AS (SELECT CAST(count(DISTINCT conv_id) AS BIGINT)"
        " AS n_convs FROM pres),\n"
        "ct AS MATERIALIZED (SELECT tool,"
        " CAST(count(*) AS BIGINT) AS c FROM pres GROUP BY tool),\n"
        "p2 AS MATERIALIZED (\n"
        "  SELECT a.tool AS tool_a, b.tool AS tool_b,\n"
        "    CAST(count(*) AS BIGINT) AS n_both\n"
        "  FROM pres a JOIN pres b\n"
        "    ON a.conv_id = b.conv_id AND a.tool < b.tool\n"
        "  GROUP BY a.tool, b.tool)\n"
        "SELECT tool_a, tool_b, n_both,\n"
        "  round(ln(CAST(n_both * n_convs AS DOUBLE)\n"
        "    / CAST(ca.c * cb.c AS DOUBLE)), 6) AS pmi\n"
        "FROM p2 JOIN ct ca ON ca.tool = tool_a\n"
        "JOIN ct cb ON cb.tool = tool_b CROSS JOIN nv"
    )
    return _graph_query(body)


def user_burstiness_sql(unit_col: str = "user_id") -> str:
    """Mirror of operators.analytics.user_burstiness: whole-second
    gaps, exact integer moments, B = (sqrt(r) - s1)/(sqrt(r) + s1)."""
    r = "CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)"
    return (
        "WITH g AS MATERIALIZED (\n"
        f"  SELECT {unit_col},\n"
        "    (ts_us - lag(ts_us) OVER (\n"
        f"      PARTITION BY {unit_col} ORDER BY ts_us, event_id))"
        " // 1000000 AS g\n"
        f"  FROM (SELECT {unit_col}, event_id,\n"
        "    CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events)),\n"
        "a AS (\n"
        f"  SELECT {unit_col}, CAST(count(*) AS BIGINT) AS n_gaps,\n"
        "    CAST(sum(g) AS BIGINT) AS s1,\n"
        "    CAST(sum(g * g) AS BIGINT) AS s2\n"
        "  FROM g WHERE g IS NOT NULL GROUP BY 1)\n"
        f"SELECT {unit_col}, n_gaps, s1 AS sum_gap_s,\n"
        "  CASE WHEN s1 > 0 OR n_gaps * s2 - s1 * s1 > 0 THEN\n"
        f"    round((sqrt({r}) - CAST(s1 AS DOUBLE))\n"
        f"      / (sqrt({r}) + CAST(s1 AS DOUBLE)), 6)\n"
        "  END AS burstiness\n"
        "FROM a"
    )


def user_type_entropy_sql(
    unit_col: str = "user_id", group_col: str = "event_type"
) -> str:
    """Mirror of operators.analytics.user_type_entropy: the identical
    -p*ln(p) term rounded to micros PER TERM, summed exactly."""
    p = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    return (
        "WITH cnts AS MATERIALIZED (\n"
        f"  SELECT {unit_col} AS u, {group_col} AS g,\n"
        "    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),\n"
        "tot AS MATERIALIZED (\n"
        "  SELECT u, CAST(sum(c) AS BIGINT) AS n,\n"
        "    CAST(count(*) AS BIGINT) AS n_types FROM cnts GROUP BY u)\n"
        f"SELECT u AS {unit_col}, n AS n_events, n_types,\n"
        f"  CAST(sum(CAST(round(-({p} * ln({p})) * 1000000, 0)"
        " AS BIGINT)) AS BIGINT) AS entropy_micros\n"
        "FROM cnts JOIN tot USING (u)\n"
        "GROUP BY u, n, n_types"
    )


def text_ttr_sql() -> str:
    """Mirror of operators.analytics.text_type_token_ratio over the
    shared tokenizer CTE; the ratio is one exact integer div."""
    return (
        f"WITH {TOKS_CTE}\n"
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,\n"
        "  CAST(count(DISTINCT t) AS BIGINT) AS n_types,\n"
        "  CAST((1000000 * count(DISTINCT t)) // count(*) AS BIGINT)"
        " AS ttr_micros\n"
        "FROM (SELECT doc_id, unnest(toks) AS t FROM toks_t)\n"
        "GROUP BY doc_id"
    )


def activity_gini_sql(unit_col: str = "user_id") -> str:
    """Mirror of operators.analytics.activity_gini: rank-sum Gini over
    per-unit counts sorted (x, u) ascending — the numerator is
    non-negative by the rearrangement inequality, so the single BIGINT
    div is tie-safe and sign-safe."""
    return (
        "WITH cnts AS MATERIALIZED (\n"
        f"  SELECT {unit_col} AS u, CAST(count(*) AS BIGINT) AS x\n"
        "  FROM events GROUP BY 1),\n"
        "rk AS (SELECT x,\n"
        "  row_number() OVER (ORDER BY x, u) AS r FROM cnts)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
        "  CAST(sum(x) AS BIGINT) AS total_events,\n"
        "  CAST((1000000 * (2 * sum(r * x) - (count(*) + 1) * sum(x)))\n"
        "    // (count(*) * sum(x)) AS BIGINT) AS gini_micros\n"
        "FROM rk"
    )


def pareto_concentration_sql(
    unit_col: str = "user_id", num: int = 4, den: int = 5
) -> str:
    """Mirror of operators.analytics.pareto_concentration: plain
    ordered cumsum at test scale (the Spark side distributes it),
    same exact integer crossing test."""
    return (
        "WITH cnts AS MATERIALIZED (\n"
        f"  SELECT {unit_col} AS u, CAST(count(*) AS BIGINT) AS x\n"
        "  FROM events GROUP BY 1),\n"
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
        "  CAST(sum(x) AS BIGINT) AS total_events FROM cnts),\n"
        "c AS MATERIALIZED (SELECT x,\n"
        "  row_number() OVER (ORDER BY x DESC, u) - 1 AS r,\n"
        "  CAST(sum(x) OVER (ORDER BY x DESC, u) AS BIGINT) AS cum\n"
        "  FROM cnts)\n"
        "SELECT n_units, total_events,\n"
        "  CAST(rmin + 1 AS BIGINT) AS k_units,\n"
        "  CAST((1000000 * (rmin + 1)) // n_units AS BIGINT)"
        " AS unit_share_micros\n"
        "FROM (SELECT min(r) AS rmin FROM c, t\n"
        f"  WHERE cum * {den} >= total_events * {num}), t"
    )


def daily_anomaly_sql(
    group_col: str = "event_type",
    ts_col: str = "ts",
    window: int = 7,
) -> str:
    """Mirror of operators.analytics.daily_anomaly: trailing ROWS
    window over the zero-filled day spine, same (div, sqrt, div)."""
    return (
        "WITH daily AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,\n"
        f"    CAST(epoch_us({ts_col}) AS BIGINT) // 86400000000 AS day,\n"
        "    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),\n"
        "rng AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),\n"
        "spine AS (SELECT unnest(range(lo, hi + 1)) AS day, g\n"
        "  FROM rng, (SELECT DISTINCT g FROM daily)),\n"
        "val AS MATERIALIZED (\n"
        "  SELECT s.g, s.day, COALESCE(y, 0) AS y\n"
        "  FROM spine s LEFT JOIN daily USING (g, day)),\n"
        "st AS MATERIALIZED (\n"
        "  SELECT g, day, y,\n"
        "    count(*) OVER w AS n, CAST(sum(y) OVER w AS BIGINT) AS s1,\n"
        "    CAST(sum(y * y) OVER w AS BIGINT) AS s2\n"
        "  FROM val WINDOW w AS (PARTITION BY g ORDER BY day\n"
        f"    ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING))\n"
        f"SELECT g AS {group_col}, day, y,\n"
        f"  CASE WHEN n = {window} AND n * s2 - s1 * s1 > 0 THEN\n"
        "    round((CAST(n * y - s1 AS DOUBLE) / n)\n"
        "      / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)"
        " / (n * (n - 1))), 6)\n"
        "  END AS z\n"
        "FROM st"
    )


def cusum_changepoint_sql(
    group_col: str = "event_type", ts_col: str = "ts"
) -> str:
    """Mirror of operators.analytics.cusum_changepoint: zero-filled day
    spine, exact-ratio micro mean, BIGINT prefix CUSUM, (|S| DESC, day
    ASC) argmax."""
    return (
        "WITH daily AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,\n"
        f"    CAST(epoch_us({ts_col}) AS BIGINT) // 86400000000 AS day,\n"
        "    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),\n"
        "rng AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),\n"
        "spine AS (SELECT unnest(range(lo, hi + 1)) AS day, g\n"
        "  FROM rng, (SELECT DISTINCT g FROM daily)),\n"
        "val AS MATERIALIZED (\n"
        "  SELECT s.g, s.day, CAST(COALESCE(y, 0) AS BIGINT) AS y\n"
        "  FROM spine s LEFT JOIN daily USING (g, day)),\n"
        "tot AS MATERIALIZED (\n"
        "  SELECT g, CAST(count(*) AS BIGINT) AS n_days,\n"
        "    CAST(SUM(y) AS BIGINT) AS total,\n"
        "    CAST((1000000 * CAST(SUM(y) AS BIGINT)\n"
        "      - (1000000 * CAST(SUM(y) AS BIGINT)) % count(*))\n"
        "      // count(*) AS BIGINT) AS mean_micros\n"
        "  FROM val GROUP BY g),\n"
        "pref AS MATERIALIZED (\n"
        "  SELECT g, day,\n"
        "    CAST(SUM(y) OVER (PARTITION BY g ORDER BY day\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS ps,\n"
        "    CAST(row_number() OVER (PARTITION BY g ORDER BY day)"
        " AS BIGINT) AS d_idx\n"
        "  FROM val),\n"
        "sarr AS MATERIALIZED (\n"
        "  SELECT p.g, t.n_days, t.total, p.day,\n"
        "    abs(1000000 * p.ps - p.d_idx * t.mean_micros) AS sabs\n"
        "  FROM pref p JOIN tot t USING (g))\n"
        f"SELECT g AS {group_col}, n_days, total, day AS cp_day,\n"
        "  CAST(sabs AS BIGINT) AS cusum_abs_micros\n"
        "FROM (SELECT *, row_number() OVER (PARTITION BY g\n"
        "    ORDER BY sabs DESC, day ASC) AS r FROM sarr)\n"
        "WHERE r = 1"
    )


def dau_wau_sql(
    unit_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> str:
    """Mirror of operators.analytics.dau_wau: presence fan-out rolling
    distinct (DuckDB range() end-exclusive == Spark sequence inclusive
    over the same window), day spine keeps silent days."""
    return (
        "WITH pres AS MATERIALIZED (\n"
        f"  SELECT DISTINCT CAST(epoch_us({ts_col}) AS BIGINT)"
        " // 86400000000 AS d,\n"
        f"    {unit_col} AS u FROM events),\n"
        "dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau\n"
        "  FROM pres GROUP BY d),\n"
        "support AS MATERIALIZED (\n"
        f"  SELECT unnest(range(d, d + {window_days})) AS d, u"
        " FROM pres),\n"
        "wau AS (SELECT d, CAST(count(DISTINCT u) AS BIGINT) AS wau\n"
        "  FROM support GROUP BY d),\n"
        "rng AS (SELECT min(d) AS lo, max(d) AS hi FROM pres),\n"
        "spine AS (SELECT unnest(range(lo, hi + 1)) AS d FROM rng)\n"
        "SELECT s.d AS day, CAST(COALESCE(dau, 0) AS BIGINT) AS dau,\n"
        "  CAST(COALESCE(wau, 0) AS BIGINT) AS wau,\n"
        "  CAST(CASE WHEN COALESCE(wau, 0) > 0\n"
        "    THEN (1000000 * COALESCE(dau, 0)) // wau ELSE 0 END"
        " AS BIGINT) AS stickiness_micros\n"
        "FROM spine s LEFT JOIN dau USING (d) LEFT JOIN wau USING (d)"
    )


def activity_trend_sql(
    group_col: str = "event_type", ts_col: str = "ts"
) -> str:
    """Mirror of operators.analytics.activity_trend: per-group OLS
    slope of daily counts, closed-form x-moments, exact integer div."""
    return (
        "WITH daily AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,\n"
        f"    CAST(epoch_us({ts_col}) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1, 2),\n"
        "rng AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),\n"
        "per AS MATERIALIZED (\n"
        "  SELECT g, hi - lo + 1 AS n, CAST(sum(y) AS BIGINT) AS sy,\n"
        "    CAST(sum((d - lo) * y) AS BIGINT) AS sxy\n"
        "  FROM daily, rng GROUP BY g, hi - lo + 1)\n"
        f"SELECT {group_col}, n_days, sum_y,\n"
        "  CAST(CASE WHEN den > 0 THEN (1000000 * num) // den END"
        " AS BIGINT) AS slope_micros\n"
        "FROM (\n"
        f"  SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_days,"
        " sy AS sum_y,\n"
        "    n * sxy - ((n * (n - 1)) // 2) * sy AS num,\n"
        "    n * ((n * (n - 1) * (2 * n - 1)) // 6)\n"
        "      - ((n * (n - 1)) // 2) * ((n * (n - 1)) // 2) AS den\n"
        "  FROM per)"
    )


def behavior_correlations_sql(
    group_col: str = "event_type", unit_col: str = "user_id"
) -> str:
    """Mirror of operators.analytics.behavior_correlations: exact
    BIGINT moments over the full unit universe, the identical
    sqrt/divide expression rounded to 6dp."""
    va = "n_units * sa.sxx - sa.sx * sa.sx"
    vb = "n_units * sb.sxx - sb.sx * sb.sx"
    return (
        "WITH cnts AS MATERIALIZED (\n"
        f"  SELECT {unit_col} AS u, {group_col} AS g,\n"
        "    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),\n"
        "st AS MATERIALIZED (\n"
        "  SELECT g, CAST(sum(c) AS BIGINT) AS sx,\n"
        "    CAST(sum(c * c) AS BIGINT) AS sxx FROM cnts GROUP BY g),\n"
        "n AS (SELECT CAST(count(DISTINCT"
        f" {unit_col}) AS BIGINT) AS n_units FROM events),\n"
        "sxy AS MATERIALIZED (\n"
        "  SELECT a.g AS ga, b.g AS gb,\n"
        "    CAST(sum(a.c * b.c) AS BIGINT) AS sum_xy\n"
        "  FROM cnts a JOIN cnts b ON a.u = b.u AND a.g < b.g\n"
        "  GROUP BY a.g, b.g)\n"
        "SELECT sa.g AS type_a, sb.g AS type_b, n_units,\n"
        "  CAST(COALESCE(sum_xy, 0) AS BIGINT) AS sum_xy,\n"
        f"  CASE WHEN {va} > 0 AND {vb} > 0\n"
        "    THEN round(CAST(n_units * COALESCE(sum_xy, 0)"
        " - sa.sx * sb.sx AS DOUBLE)\n"
        f"      / (sqrt(CAST({va} AS DOUBLE))"
        f" * sqrt(CAST({vb} AS DOUBLE))), 6)\n"
        "  END AS corr\n"
        "FROM st sa JOIN st sb ON sa.g < sb.g\n"
        "LEFT JOIN sxy ON ga = sa.g AND gb = sb.g\n"
        "CROSS JOIN n"
    )


def assign_splits_sql(
    key_col: str = "doc_id",
    splits: tuple = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> str:
    """Mirror of operators.packing.assign_splits over documents: the
    identical cumulative 2^48 thresholds, last split as the ELSE."""
    h = _h48(f"'{salt}:' || CAST({key_col} AS VARCHAR)")
    cases, cum = [], 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cases.append(
            f"WHEN h < {int(cum * (1 << 48))} THEN '{name}'"
        )
    case = (
        "CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"
    )
    return (
        f"SELECT doc_id, lang, {case} AS split\n"
        f"FROM (SELECT doc_id, lang, {h} AS h FROM documents)"
    )


def k_anonymity_sql() -> str:
    """Mirror of operators.profiling.k_anonymity over events with the
    (event_type, day, hour) quasi-identifier."""
    return (
        "SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,\n"
        "  CAST(class_size * count(*) AS BIGINT) AS n_rows\n"
        "FROM (SELECT CAST(count(*) AS BIGINT) AS class_size\n"
        "      FROM events\n"
        "      GROUP BY event_type, CAST(ts AS DATE), hour(ts))\n"
        "GROUP BY class_size"
    )


def dispersion_index_sql(
    group_col: str = "event_type", unit_col: str = "user_id"
) -> str:
    """Mirror of operators.profiling.dispersion_index: the same double
    aggregation, exact-ratio mean, and the identical double-routed VMR
    expression rounded 6dp."""
    return (
        "WITH di_p AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g, {unit_col} AS u,\n"
        "    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),\n"
        "di_m AS MATERIALIZED (\n"
        "  SELECT g, CAST(count(*) AS BIGINT) AS n_units,\n"
        "    CAST(SUM(x) AS BIGINT) AS s1,\n"
        "    CAST(SUM(x * x) AS BIGINT) AS s2\n"
        "  FROM di_p GROUP BY g)\n"
        f"SELECT g AS {group_col}, n_units,\n"
        "  CAST((1000000 * s1 - (1000000 * s1) % n_units) // n_units"
        " AS BIGINT) AS mean_micros,\n"
        "  CASE WHEN n_units > 1 THEN\n"
        "    round((CAST(n_units AS DOUBLE) * s2"
        " - CAST(s1 AS DOUBLE) * s1)\n"
        "      / ((n_units - 1) * CAST(s1 AS DOUBLE)), 6)\n"
        "  END AS vmr\n"
        "FROM di_m"
    )


def l_diversity_sql() -> str:
    """Mirror of operators.profiling.l_diversity over events with the
    (event_type, day, hour) quasi-identifier and user_id sensitive."""
    return (
        "SELECT l_value, CAST(count(*) AS BIGINT) AS n_classes,\n"
        "  CAST(SUM(rows_in_class) AS BIGINT) AS n_rows\n"
        "FROM (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS l_value,\n"
        "        CAST(count(*) AS BIGINT) AS rows_in_class\n"
        "      FROM events\n"
        "      GROUP BY event_type, CAST(ts AS DATE), hour(ts))\n"
        "GROUP BY l_value"
    )


def triangle_surprise_sql() -> str:
    """Mirror of algos.triangles.triangle_surprise: exact degree moments
    over und, the degree-oriented triangle count, the identically
    staged r = s2x/s1 then r³/6 expression."""
    body = (
        f", {_TRI_CTES},\n"
        "ts_m AS MATERIALIZED (\n"
        "  SELECT CAST(SUM(d) AS BIGINT) AS s1,\n"
        "    CAST(SUM(d * (d - 1)) AS BIGINT) AS s2x\n"
        "  FROM (SELECT count(*) AS d FROM und GROUP BY src)),\n"
        "ts_t AS (SELECT CAST(count(*) AS BIGINT) AS triangles FROM tri),\n"
        "ts_r AS (SELECT triangles, s1, s2x,\n"
        "  CAST(s2x AS DOUBLE) / s1 AS r FROM ts_t, ts_m)\n"
        "SELECT triangles, s1, s2x,\n"
        "  round(r * r * r / 6.0, 6) AS expected,\n"
        "  CASE WHEN r > 0 THEN"
        " round(triangles / (r * r * r / 6.0), 6) END AS surprise\n"
        "FROM ts_r"
    )
    return _graph_query(body)


def kmv_set_overlap_sql(
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
) -> str:
    """Mirror of operators.sketches.kmv_set_overlap: merged KMV union
    sketch per group pair, rho-scaled intersection/Jaccard, exact
    witnesses — all integer arithmetic over the shared 48-bit md5."""
    h = _h48(f"CAST({value_col} AS VARCHAR)")
    mult = (k - 1) * (1 << 48)
    return (
        "WITH hs AS MATERIALIZED (\n"
        f"  SELECT DISTINCT {group_col} AS g, {h} AS h FROM events),\n"
        "sk AS MATERIALIZED (\n"
        "  SELECT g, h FROM (SELECT g, h,\n"
        "    row_number() OVER (PARTITION BY g ORDER BY h) AS rn"
        " FROM hs)\n"
        f"  WHERE rn <= {k}),\n"
        "gs AS MATERIALIZED (SELECT DISTINCT g FROM sk),\n"
        "pr AS MATERIALIZED (\n"
        "  SELECT group_a, group_b, h,\n"
        "    max(in_a) AS in_a, max(in_b) AS in_b FROM (\n"
        "    SELECT s.g AS group_a, g2.g AS group_b, h,"
        " 1 AS in_a, 0 AS in_b\n"
        "    FROM sk s JOIN gs g2 ON s.g < g2.g\n"
        "    UNION ALL\n"
        "    SELECT g2.g, s.g, h, 0, 1\n"
        "    FROM sk s JOIN gs g2 ON g2.g < s.g)\n"
        "  GROUP BY group_a, group_b, h),\n"
        "us AS MATERIALIZED (\n"
        "  SELECT * FROM (SELECT *,\n"
        "    row_number() OVER (PARTITION BY group_a, group_b"
        " ORDER BY h) AS rn\n"
        f"    FROM pr) WHERE rn <= {k}),\n"
        "ag AS MATERIALIZED (\n"
        "  SELECT group_a, group_b, count(*) AS L, max(h) AS hk,\n"
        "    sum(in_a * in_b) AS rho\n"
        "  FROM us GROUP BY group_a, group_b),\n"
        "e AS MATERIALIZED (SELECT group_a, group_b,\n"
        f"  CAST(CASE WHEN L < {k} THEN L ELSE {mult} // hk END"
        " AS BIGINT) AS est_union, L, rho FROM ag),\n"
        "exi AS MATERIALIZED (\n"
        "  SELECT a.g AS group_a, b.g AS group_b,\n"
        "    CAST(count(*) AS BIGINT) AS exact_intersection\n"
        "  FROM hs a JOIN hs b ON a.h = b.h AND a.g < b.g\n"
        "  GROUP BY a.g, b.g),\n"
        "sz AS MATERIALIZED (SELECT g, count(*) AS n FROM hs"
        " GROUP BY g)\n"
        "SELECT e.group_a, e.group_b, est_union,\n"
        "  CAST((rho * est_union) // L AS BIGINT)"
        " AS est_intersection,\n"
        "  CAST((1000000 * rho) // L AS BIGINT) AS jaccard_micros,\n"
        "  CAST(sa.n + sb.n - COALESCE(exact_intersection, 0)"
        " AS BIGINT) AS exact_union,\n"
        "  CAST(COALESCE(exact_intersection, 0) AS BIGINT)"
        " AS exact_intersection\n"
        "FROM e JOIN sz sa ON sa.g = e.group_a\n"
        "JOIN sz sb ON sb.g = e.group_b\n"
        "LEFT JOIN exi USING (group_a, group_b)"
    )


def hll_distinct_sql(group_col: str = "event_type",
                     value_col: str = "user_id", b: int = 6) -> str:
    """Mirror of operators.sketches.hll_distinct_by over the events
    table: registers are integer/string arithmetic over the shared
    48-bit md5 (bucket = bottom b bits, rho via length(bin(w)) — both
    engines render bin() without leading zeros), the harmonic sum is
    exact in double (dyadic terms), and the one multiply/divide (+ ln
    in the small-range branch) is the identical expression with the
    identical alpha literal, rounded to 6dp."""
    m = 1 << b
    rho_max = 48 - b + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    h = _h48(f"CAST({value_col} AS VARCHAR)")
    return (
        "WITH keyed AS MATERIALIZED (\n"
        f"  SELECT {group_col}, h % {m} AS bucket, h // {m} AS w\n"
        f"  FROM (SELECT {group_col}, {h} AS h FROM events)),\n"
        "regs AS MATERIALIZED (\n"
        f"  SELECT {group_col}, bucket,\n"
        f"    max(CASE WHEN w = 0 THEN {rho_max}\n"
        f"        ELSE {rho_max} - length(bin(w)) END) AS reg\n"
        f"  FROM keyed GROUP BY {group_col}, bucket),\n"
        "pg AS (\n"
        f"  SELECT {group_col}, CAST(count(*) AS BIGINT) AS nonzero,\n"
        "    sum(pow(2.0, -reg)) AS sum_pow\n"
        f"  FROM regs GROUP BY {group_col}),\n"
        "est AS (\n"
        f"  SELECT {group_col}, CAST({m} - nonzero AS BIGINT)"
        " AS n_zero_buckets,\n"
        f"    CAST({alpha * m * m!r} AS DOUBLE) / (sum_pow +"
        f" CAST({m} - nonzero AS DOUBLE)) AS raw\n"
        "  FROM pg),\n"
        "ex AS (\n"
        f"  SELECT {group_col}, CAST(count(*) AS BIGINT)"
        " AS exact_distinct\n"
        f"  FROM (SELECT DISTINCT {group_col},"
        f" CAST({value_col} AS VARCHAR) AS v FROM events)\n"
        f"  GROUP BY {group_col})\n"
        f"SELECT e.{group_col},\n"
        f"  round(CASE WHEN raw <= {2.5 * m!r} AND n_zero_buckets > 0\n"
        f"    THEN {float(m)!r} * ln({float(m)!r}"
        " / CAST(n_zero_buckets AS DOUBLE))\n"
        "    ELSE raw END, 6) AS est_hll,\n"
        "  n_zero_buckets, exact_distinct\n"
        f"FROM est e JOIN ex USING ({group_col})"
    )


def hll_union_overlap_sql(
    group_col: str = "event_type",
    value_col: str = "user_id",
    b: int = 6,
) -> str:
    """Mirror of operators.sketches.hll_union_overlap: register-wise
    max merge per pair, the standard estimate over merged registers,
    inclusion-exclusion intersection clamped at 0."""
    m = 1 << b
    rho_max = 48 - b + 1
    amm = 0.7213 / (1 + 1.079 / m) * m * m
    h = _h48(f"CAST({value_col} AS VARCHAR)")
    est = (
        "round(CASE WHEN raw <= {lim!r} AND zeros > 0\n"
        "    THEN {mf!r} * ln({mf!r} / zeros) ELSE raw END, 6)"
    ).format(lim=2.5 * m, mf=float(m))
    inner = (
        "SELECT {keys}, CAST({m} - count(*) AS DOUBLE) AS zeros,\n"
        "      CAST({amm!r} AS DOUBLE) / (sum(pow(2.0, -reg))"
        " + CAST({m} - count(*) AS DOUBLE)) AS raw\n"
        "    FROM {src} GROUP BY {keys}"
    )
    return (
        "WITH keyed AS MATERIALIZED (\n"
        f"  SELECT g, h % {m} AS bucket, h // {m} AS w\n"
        f"  FROM (SELECT {group_col} AS g, {h} AS h FROM events)),\n"
        "regs AS MATERIALIZED (\n"
        "  SELECT g, bucket,\n"
        f"    max(CASE WHEN w = 0 THEN {rho_max}\n"
        f"        ELSE {rho_max} - length(bin(w)) END) AS reg\n"
        "  FROM keyed GROUP BY g, bucket),\n"
        "gs AS MATERIALIZED (SELECT DISTINCT g FROM regs),\n"
        "eg AS MATERIALIZED (\n"
        f"  SELECT g, {est} AS est FROM (\n"
        f"    {inner.format(keys='g', m=m, amm=amm, src='regs')})),\n"
        "fan AS MATERIALIZED (\n"
        "  SELECT group_a, group_b, bucket, max(reg) AS reg FROM (\n"
        "    SELECT r.g AS group_a, g2.g AS group_b, bucket, reg\n"
        "    FROM regs r JOIN gs g2 ON r.g < g2.g\n"
        "    UNION ALL\n"
        "    SELECT g2.g, r.g, bucket, reg\n"
        "    FROM regs r JOIN gs g2 ON g2.g < r.g)\n"
        "  GROUP BY group_a, group_b, bucket),\n"
        "eu AS MATERIALIZED (\n"
        f"  SELECT group_a, group_b, {est} AS est_union FROM (\n"
        f"    {inner.format(keys='group_a, group_b', m=m, amm=amm, src='fan')})),\n"
        "hs AS MATERIALIZED (\n"
        f"  SELECT DISTINCT {group_col} AS g, {h} AS h FROM events),\n"
        "exu AS MATERIALIZED (\n"
        "  SELECT group_a, group_b,\n"
        "    CAST(count(DISTINCT h) AS BIGINT) AS exact_union FROM (\n"
        "    SELECT a.g AS group_a, g2.g AS group_b, h\n"
        "    FROM hs a JOIN gs g2 ON a.g < g2.g\n"
        "    UNION ALL\n"
        "    SELECT g2.g, a.g, h FROM hs a JOIN gs g2 ON g2.g < a.g)\n"
        "  GROUP BY group_a, group_b)\n"
        "SELECT eu.group_a, eu.group_b, ea.est AS est_a,\n"
        "  eb.est AS est_b, est_union,\n"
        "  round(greatest(ea.est + eb.est - est_union, 0.0), 6)"
        " AS est_intersection,\n"
        "  exact_union\n"
        "FROM eu JOIN eg ea ON ea.g = eu.group_a\n"
        "JOIN eg eb ON eb.g = eu.group_b\n"
        "JOIN exu USING (group_a, group_b)"
    )


def cms_heavy_hitters_sql(
    key: str = "user_id",
    k: int = 20,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> str:
    """Mirror of operators.sketches.cms_estimate_heavy_hitters over
    events: the Count-Min sketch over the salted 48-bit md5 is
    deterministic, so the point-query min is hash-exact across engines."""
    cell = _h48(
        f"'{salt}' || ':' || CAST(t.row AS VARCHAR) || ':' || ks.k"
    )
    pcell = _h48(
        f"'{salt}' || ':' || CAST(t.row AS VARCHAR) || ':' "
        f"|| CAST(e.{key} AS VARCHAR)"
    )
    return (
        "WITH ks AS MATERIALIZED (\n"
        f"  SELECT CAST({key} AS VARCHAR) AS k FROM events),\n"
        "sketch AS MATERIALIZED (\n"
        f"  SELECT t.row, {cell} % {width} AS cell,"
        " CAST(count(*) AS BIGINT) AS n\n"
        f"  FROM ks, range(0, {depth}) AS t(row) GROUP BY 1, 2),\n"
        "ex AS MATERIALIZED (\n"
        f"  SELECT {key}, CAST(count(*) AS BIGINT) AS exact_n FROM events\n"
        f"  GROUP BY {key} ORDER BY exact_n DESC, {key} ASC LIMIT {k}),\n"
        "probes AS MATERIALIZED (\n"
        f"  SELECT e.{key}, e.exact_n, t.row, {pcell} % {width} AS cell\n"
        f"  FROM ex e, range(0, {depth}) AS t(row))\n"
        f"SELECT p.{key}, p.exact_n, min(s.n) AS cms_est\n"
        "FROM probes p JOIN sketch s ON s.row = p.row AND s.cell = p.cell\n"
        f"GROUP BY p.{key}, p.exact_n"
    )


def tf_idf_sql(min_df: int = 1) -> str:
    """Mirror of operators.tfidf.tf_idf: integer micro-unit idf rounded
    once per term, multiplied by the integer tf — BIGINT-exact scores."""
    flt = f"WHERE d.df >= {min_df}\n" if min_df > 1 else ""
    return (
        f"WITH {TOKS_CTE},\n"
        "tk AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term"
        " FROM toks_t),\n"
        "tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM tk"
        " GROUP BY doc_id, term),\n"
        "dfx AS MATERIALIZED (SELECT term, count(*) AS df FROM tf"
        " GROUP BY term),\n"
        "nn AS (SELECT count(*) AS n FROM documents)\n"
        "SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,\n"
        "  CAST(d.df AS BIGINT) AS df,\n"
        "  CAST(t.tf * CAST(round(1000000.0 *\n"
        "    ln((SELECT n FROM nn) * 1.0 / d.df)) AS BIGINT) AS BIGINT)\n"
        "    AS tfidf_micros\n"
        "FROM tf t JOIN dfx d USING (term)\n"
        f"{flt}"
    )


def tfidf_cosine_sql(min_cos: float = 0.3, max_df_permille: int = 100,
                     min_df: int = 1) -> str:
    """Mirror of operators.tfidf.tfidf_cosine_pairs: the inverted-index
    pair join over the df-capped weight table, exact integer dot/norm
    sums, one identically-structured float expression."""
    extra = f" AND d.df >= {min_df}" if min_df > 1 else ""
    return (
        f"WITH {TOKS_CTE},\n"
        "tk AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term"
        " FROM toks_t),\n"
        "tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM tk"
        " GROUP BY doc_id, term),\n"
        "dfx AS MATERIALIZED (SELECT term, count(*) AS df FROM tf"
        " GROUP BY term),\n"
        "nn AS (SELECT count(*) AS n FROM documents),\n"
        "w AS MATERIALIZED (\n"
        "  SELECT t.doc_id, t.term,\n"
        "    CAST(t.tf * CAST(round(1000000.0 *\n"
        "      ln((SELECT n FROM nn) * 1.0 / d.df)) AS BIGINT) AS BIGINT)"
        " AS wt\n"
        "  FROM tf t JOIN dfx d USING (term)\n"
        f"  WHERE d.df * 1000 <= (SELECT n FROM nn) * {max_df_permille}"
        f"{extra}),\n"
        "norms AS MATERIALIZED (SELECT doc_id,"
        " CAST(sum(wt * wt) AS BIGINT) AS nsq FROM w GROUP BY doc_id),\n"
        "dots AS MATERIALIZED (\n"
        "  SELECT x.doc_id AS a, y.doc_id AS b,"
        " CAST(sum(x.wt * y.wt) AS BIGINT) AS dot\n"
        "  FROM w x JOIN w y ON y.term = x.term AND x.doc_id < y.doc_id\n"
        "  GROUP BY x.doc_id, y.doc_id)\n"
        "SELECT a, b, cos FROM (\n"
        "  SELECT d.a, d.b,\n"
        "    round(CAST(d.dot AS DOUBLE) /\n"
        "      (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))),"
        " 6) AS cos\n"
        "  FROM dots d JOIN norms na ON na.doc_id = d.a\n"
        "  JOIN norms nb ON nb.doc_id = d.b)\n"
        f"WHERE cos >= {min_cos}"
    )


def token_cooccurrence_sql(min_count: int = 2) -> str:
    """Mirror of operators.cooccurrence.token_cooccurrence: distinct
    non-stop tokens per doc, per-doc ordered pair self-join, grouped
    count with the ``min_count`` output filter."""
    return (
        f"WITH {TOKS_CTE},\n"
        "tk AS MATERIALIZED (\n"
        "  SELECT DISTINCT doc_id, tok FROM (\n"
        "    SELECT doc_id, unnest(toks) AS tok FROM toks_t)\n"
        f"  WHERE NOT list_contains({_STOPLIST}, tok))\n"
        "SELECT a.tok AS tok_a, b.tok AS tok_b,\n"
        "  CAST(count(*) AS BIGINT) AS n_docs\n"
        "FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.tok < b.tok\n"
        "GROUP BY a.tok, b.tok\n"
        f"HAVING count(*) >= {min_count}"
    )


def degree_assortativity_sql() -> str:
    """Mirror of algos.stats.degree_assortativity: exact integer sums
    over the und closure, floats only in the final Pearson expression —
    written with the identical cast structure as the Spark side (each
    long subexpression cast to double before the one overflow-capable
    multiply), so the 6dp rounding cannot diverge."""
    return _graph_query(
        ", dg AS MATERIALIZED (SELECT src, count(*) AS d FROM und"
        " GROUP BY src),\n"
        "ee AS MATERIALIZED (\n"
        "  SELECT a.d AS dx, b.d AS dy\n"
        "  FROM und JOIN dg a ON a.src = und.src JOIN dg b ON b.src = und.dst),\n"
        "s AS (SELECT CAST(count(*) AS BIGINT) AS m,\n"
        "  CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,\n"
        "  CAST(sum(dx * dy) AS BIGINT) AS sxy,\n"
        "  CAST(sum(dx * dx) AS BIGINT) AS sxx,\n"
        "  CAST(sum(dy * dy) AS BIGINT) AS syy\n"
        "  FROM ee)\n"
        "SELECT m, round(CAST(m * sxy - sx * sy AS DOUBLE) /\n"
        "  sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *"
        " CAST(m * syy - sy * sy AS DOUBLE)), 6) AS assortativity\n"
        "FROM s"
    )


def role_assortativity_sql() -> str:
    """Mirror of algos.stats.attribute_assortativity with role labels
    from the transcript adapter (tv carries (id, role))."""
    body = """
, ee AS MATERIALIZED (
  SELECT s.role AS la, d.role AS lb
  FROM edges e JOIN tv s ON s.id = e.src JOIN tv d ON d.id = e.dst),
per AS MATERIALIZED (SELECT la, lb, count(*) AS c FROM ee GROUP BY la, lb),
pa AS MATERIALIZED (
  SELECT la, SUM(c) AS ai,
         SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS same_i
  FROM per GROUP BY la),
pb AS MATERIALIZED (SELECT lb AS la, SUM(c) AS bi FROM per GROUP BY lb),
pl AS MATERIALIZED (
  SELECT COALESCE(pa.ai, 0) AS ai, COALESCE(pb.bi, 0) AS bi,
         COALESCE(pa.same_i, 0) AS same_i
  FROM pa FULL JOIN pb ON pb.la = pa.la)
SELECT CAST(SUM(ai) AS BIGINT) AS n_edges,
  CASE WHEN SUM(ai) * SUM(ai) - SUM(ai * bi) <> 0
       THEN round(
         CAST(SUM(ai) * SUM(same_i) - SUM(ai * bi) AS DOUBLE)
         / CAST(SUM(ai) * SUM(ai) - SUM(ai * bi) AS DOUBLE), 6)
  END AS assortativity
FROM pl
""".strip()
    return _graph_query(body)


def modularity_sql() -> str:
    """Mirror of algos.stats.modularity over the conversation partition
    (label = conv_id): the exact rational (m2·Σe_c − Σd_c²)/m2² with
    integer aggregates and one float division, cast-identically."""
    return _graph_query(
        ", lab AS MATERIALIZED (SELECT id, conv_id AS lb FROM vertices),\n"
        "ee AS MATERIALIZED (\n"
        "  SELECT a.lb AS la, b.lb AS lbb\n"
        "  FROM und JOIN lab a ON a.id = und.src JOIN lab b ON b.id = und.dst),\n"
        "s AS (SELECT CAST(count(*) AS BIGINT) AS m2,\n"
        "  CAST(sum(CASE WHEN la = lbb THEN 1 ELSE 0 END) AS BIGINT) AS same\n"
        "  FROM ee),\n"
        "d AS (SELECT la, count(*) AS dc FROM ee GROUP BY la),\n"
        "sq AS (SELECT CAST(sum(dc * dc) AS BIGINT) AS sdd FROM d)\n"
        "SELECT s.m2, round(CAST(s.m2 * s.same - sq.sdd AS DOUBLE) /\n"
        "  (CAST(s.m2 AS DOUBLE) * CAST(s.m2 AS DOUBLE)), 6) AS modularity\n"
        "FROM s, sq"
    )


def avg_neighbor_degree_sql() -> str:
    """Mirror of operators.neighborhood.neighborhood_agg with the
    undirected degree table fed back in as the neighbor attribute —
    integer sums/min/max, the mean is one double division rounded 6dp."""
    body = (
        ", dg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM und"
        " GROUP BY src),\n"
        "na AS MATERIALIZED (\n"
        "  SELECT u.src AS id, count(*) AS n_nbrs, sum(d.deg) AS s,\n"
        "    min(d.deg) AS mn, max(d.deg) AS mx\n"
        "  FROM und u JOIN dg d ON d.id = u.dst GROUP BY u.src)\n"
        "SELECT v.id, CAST(COALESCE(na.n_nbrs, 0) AS BIGINT) AS n_nbrs,\n"
        "  CAST(na.s AS BIGINT) AS sum_val, CAST(na.mn AS BIGINT) AS min_val,\n"
        "  CAST(na.mx AS BIGINT) AS max_val,\n"
        "  round(na.s * 1.0 / na.n_nbrs, 6) AS mean_val\n"
        "FROM vertices v LEFT JOIN na ON na.id = v.id"
    )
    return _graph_query(body)


def random_walks_sql(walks_per_vertex: int = 2, walk_length: int = 8) -> str:
    """Mirror of algos.walks.random_walks (undirected): the L steps
    unrolled as CTEs, each picking neighbor index
    ``hash48(walk_id ':' t) % deg`` over the dst-ranked adjacency —
    the same deterministic choice rule, so every visited vertex is
    hash-exact."""
    W = walks_per_vertex
    ctes = [
        ", adj AS MATERIALIZED (\n"
        "  SELECT src, dst,\n"
        "    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx\n"
        "  FROM und),\n"
        "dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und"
        " GROUP BY src),\n"
        f"s0 AS MATERIALIZED (\n"
        f"  SELECT v.id * {W} + w.w AS walk_id, v.id AS cur\n"
        f"  FROM vertices v CROSS JOIN"
        f" (SELECT unnest(range({W})) AS w) w)"
    ]
    for t in range(1, walk_length + 1):
        pick = _h48(f"s.walk_id || ':' || {t}")
        ctes.append(
            f"s{t} AS MATERIALIZED (\n"
            f"  SELECT s.walk_id, a.dst AS cur\n"
            f"  FROM s{t - 1} s\n"
            "  JOIN dg ON dg.src = s.cur\n"
            f"  JOIN adj a ON a.src = s.cur AND a.idx = {pick} % dg.deg)"
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS vertex"
        f" FROM s{t}"
        for t in range(walk_length + 1)
    )
    return _graph_query(",\n".join(ctes) + "\n" + selects)


def metapath_walks_sql(
    metapath: list[str], walk_length: int = 6, walks_per_vertex: int = 1
) -> str:
    """Mirror of algos.walks.metapath_walks: the typed dst-ranked
    adjacency (role from tv), unrolled steps picking typed-neighbor
    index ``hash48(walk_id ':' t) % typed_deg`` with the step's type
    literal in both joins."""
    W = walks_per_vertex
    L = len(metapath)
    ctes = [
        ", ty AS MATERIALIZED (SELECT id, role AS vtype FROM tv),\n"
        "tadj AS MATERIALIZED (\n"
        "  SELECT u.src, u.dst, ty.vtype AS dtype,\n"
        "    row_number() OVER (PARTITION BY u.src, ty.vtype"
        " ORDER BY u.dst) - 1 AS idx\n"
        "  FROM und u JOIN ty ON ty.id = u.dst),\n"
        "tdg AS MATERIALIZED (SELECT src, dtype, count(*) AS deg"
        " FROM tadj GROUP BY src, dtype),\n"
        f"m0 AS MATERIALIZED (\n"
        f"  SELECT t.id * {W} + w.w AS walk_id, t.id AS cur\n"
        f"  FROM ty t CROSS JOIN (SELECT unnest(range({W})) AS w) w\n"
        f"  WHERE t.vtype = '{metapath[0]}')"
    ]
    for t in range(1, walk_length + 1):
        tt = metapath[t % L].replace("'", "''")
        pick = _h48(f"s.walk_id || ':' || {t}")
        ctes.append(
            f"m{t} AS MATERIALIZED (\n"
            f"  SELECT s.walk_id, a.dst AS cur\n"
            f"  FROM m{t - 1} s\n"
            f"  JOIN tdg ON tdg.src = s.cur AND tdg.dtype = '{tt}'\n"
            f"  JOIN tadj a ON a.src = s.cur AND a.dtype = '{tt}'\n"
            f"    AND a.idx = {pick} % tdg.deg)"
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS vertex"
        f" FROM m{t}"
        for t in range(walk_length + 1)
    )
    return _graph_query(",\n".join(ctes) + "\n" + selects)


def node2vec_walks_sql(
    walks_per_vertex: int = 1,
    walk_length: int = 5,
    return_micros: int = 500_000,
    inout_micros: int = 2_000_000,
) -> str:
    """Mirror of algos.walks.node2vec_walks: the L steps unrolled, step 1
    uniform, steps >= 2 picking the cumulative-integer-weight bucket
    containing ``hash48(walk_id ':' t) mod total`` over the dst-ranked
    neighborhood of cur — weight = return_micros when the candidate is
    prev, 1e6 when (prev, candidate) is an edge, else inout_micros."""
    W = walks_per_vertex
    ctes = [
        ", adj AS MATERIALIZED (\n"
        "  SELECT src, dst,\n"
        "    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx\n"
        "  FROM und),\n"
        "dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und"
        " GROUP BY src),\n"
        f"s0 AS MATERIALIZED (\n"
        f"  SELECT v.id * {W} + w.w AS walk_id, v.id AS cur\n"
        f"  FROM vertices v CROSS JOIN"
        f" (SELECT unnest(range({W})) AS w) w)"
    ]
    if walk_length >= 1:
        p1 = _h48("s.walk_id || ':' || 1")
        ctes.append(
            "s1 AS MATERIALIZED (\n"
            "  SELECT s.walk_id, s.cur AS prev, a.dst AS cur\n"
            "  FROM s0 s\n"
            "  JOIN dg ON dg.src = s.cur\n"
            f"  JOIN adj a ON a.src = s.cur AND a.idx = {p1} % dg.deg)"
        )
    for t in range(2, walk_length + 1):
        r = _h48(f"walk_id || ':' || {t}")
        ctes.append(
            f"c{t} AS MATERIALIZED (\n"
            "  SELECT s.walk_id, s.prev, s.cur, a.dst AS x, a.idx,\n"
            f"    CAST(CASE WHEN a.dst = s.prev THEN {return_micros}\n"
            "         WHEN pe.src IS NOT NULL THEN 1000000\n"
            f"         ELSE {inout_micros} END AS BIGINT) AS wt\n"
            f"  FROM s{t - 1} s\n"
            "  JOIN adj a ON a.src = s.cur\n"
            "  LEFT JOIN adj pe ON pe.src = s.prev AND pe.dst = a.dst)"
        )
        ctes.append(
            f"w{t} AS MATERIALIZED (\n"
            "  SELECT walk_id, cur, x,\n"
            "    sum(wt) OVER (PARTITION BY walk_id ORDER BY idx) - wt"
            " AS cum_lo,\n"
            "    sum(wt) OVER (PARTITION BY walk_id ORDER BY idx) AS cum_hi,\n"
            "    sum(wt) OVER (PARTITION BY walk_id) AS total\n"
            f"  FROM c{t})"
        )
        ctes.append(
            f"s{t} AS MATERIALIZED (\n"
            "  SELECT walk_id, cur AS prev, x AS cur\n"
            f"  FROM w{t}\n"
            f"  WHERE {r} % total >= cum_lo AND {r} % total < cum_hi)"
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({t} AS BIGINT) AS step, cur AS vertex"
        f" FROM s{t}"
        for t in range(walk_length + 1)
    )
    return _graph_query(",\n".join(ctes) + "\n" + selects)


def sample_neighbors_sql(
    n_seeds: int = 50, fanouts: tuple[int, ...] = (3, 2)
) -> str:
    """Mirror of algos.sampling.sample_neighbors: hops unrolled, each
    keeping the fanout smallest-ranked neighbors per (seed, frontier
    vertex) by the identical hash48(seed:hop:src:dst) rank."""
    ctes = [
        f", s0 AS MATERIALIZED (SELECT id AS seed, id AS v FROM vertices"
        f" WHERE id < {n_seeds})"
    ]
    for h, f in enumerate(fanouts, start=1):
        rank = _h48(
            f"s.seed || ':' || {h} || ':' || a.src || ':' || a.dst"
        )
        ctes.append(
            f"h{h} AS MATERIALIZED (\n"
            "  SELECT seed, src, dst FROM (\n"
            "    SELECT s.seed, a.src, a.dst,\n"
            "      row_number() OVER (PARTITION BY s.seed, a.src\n"
            f"        ORDER BY {rank}, a.dst) AS rn\n"
            f"    FROM s{h - 1} s JOIN und a ON a.src = s.v)\n"
            f"  WHERE rn <= {f})"
        )
        ctes.append(
            f"s{h} AS MATERIALIZED (SELECT DISTINCT seed, dst AS v FROM h{h})"
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT seed, CAST({h} AS BIGINT) AS hop, src, dst FROM h{h}"
        for h in range(1, len(fanouts) + 1)
    )
    return _graph_query(",\n".join(ctes) + "\n" + selects)


def events_quantiles_sql(group_col: str = "event_type",
                         value_col: str = "value",
                         percents: tuple[int, ...] = (50, 90, 99)) -> str:
    """Mirror of operators.quantiles.grouped_quantiles: discrete quantile
    at 1-indexed rank ceil(p·n) computed in integer arithmetic
    (``(n*pct + 99) // 100``) — the selected element is bit-identical
    across engines, 6dp rounding only for the hash."""
    picks = ",\n".join(
        f"  round(max(CASE WHEN rn = (n.n * {pct} + 99) // {100} "
        f"THEN {value_col} END), 6) AS p{pct}"
        for pct in percents
    )
    return (
        "WITH src AS MATERIALIZED (\n"
        f"  SELECT {group_col}, {value_col} FROM events\n"
        f"  WHERE {value_col} IS NOT NULL),\n"
        "r AS MATERIALIZED (\n"
        f"  SELECT {group_col}, {value_col},\n"
        f"    row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col})"
        " AS rn\n"
        "  FROM src),\n"
        f"n AS (SELECT {group_col}, count(*) AS n FROM src"
        f" GROUP BY {group_col})\n"
        f"SELECT r.{group_col}, CAST(max(n.n) AS BIGINT) AS n,\n"
        f"{picks}\n"
        f"FROM r JOIN n USING ({group_col})\n"
        f"GROUP BY r.{group_col}"
    )


def quantile_bucketize_sql(group_col: str = "event_type",
                           value_col: str = "value",
                           id_col: str = "event_id",
                           num_buckets: int = 4) -> str:
    """Mirror of operators.quantiles.quantile_bucketize: bucket = count
    of per-group discrete quantile cuts the value strictly exceeds."""
    percents = tuple((100 // num_buckets) * i for i in range(1, num_buckets))
    picks = ",\n".join(
        f"  round(max(CASE WHEN rn = (n.n * {pct} + 99) // {100} "
        f"THEN {value_col} END), 6) AS p{pct}"
        for pct in percents
    )
    bucket = " + ".join(
        f"(CASE WHEN e.{value_col} > c.p{pct} THEN 1 ELSE 0 END)"
        for pct in percents
    )
    return (
        "WITH src AS MATERIALIZED (\n"
        f"  SELECT {group_col}, {value_col} FROM events\n"
        f"  WHERE {value_col} IS NOT NULL),\n"
        "r AS MATERIALIZED (\n"
        f"  SELECT {group_col}, {value_col},\n"
        f"    row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col})"
        " AS rn\n"
        "  FROM src),\n"
        f"n AS (SELECT {group_col}, count(*) AS n FROM src"
        f" GROUP BY {group_col}),\n"
        "cuts AS MATERIALIZED (\n"
        f"  SELECT r.{group_col},\n{picks}\n"
        f"  FROM r JOIN n USING ({group_col})\n"
        f"  GROUP BY r.{group_col})\n"
        f"SELECT e.{id_col}, e.{group_col}, e.{value_col},\n"
        f"  CAST({bucket} AS BIGINT) AS bucket\n"
        f"FROM events e JOIN cuts c ON c.{group_col} = e.{group_col}\n"
        f"WHERE e.{value_col} IS NOT NULL"
    )


def triangles_per_vertex_sql() -> str:
    body = (
        f", {_TRI_CTES}\n"
        "SELECT v.id, CAST(count(x.v) AS BIGINT) AS count\n"
        "FROM vertices v LEFT JOIN (\n"
        "  SELECT unnest([v1, v2, v3]) AS v FROM tri) x ON x.v = v.id\n"
        "GROUP BY v.id"
    )
    return _graph_query(body)


# ---------------------------------------------------------------------------
# documents / embeddings pipeline queries
# ---------------------------------------------------------------------------

def dedup_exact_sql() -> str:
    return (
        "WITH d AS MATERIALIZED (SELECT doc_id, md5(text) AS digest FROM documents),\n"
        "c AS MATERIALIZED (SELECT digest, min(doc_id) AS canonical_id FROM d GROUP BY digest)\n"
        "SELECT d.doc_id, c.canonical_id, d.doc_id <> c.canonical_id AS is_dup\n"
        "FROM d JOIN c ON c.digest = d.digest"
    )


_SHINGLES_CTE = (
    "sh AS MATERIALIZED (\n"
    "  SELECT doc_id, unnest(list_distinct(\n"
    "    CASE WHEN len(toks) >= 3 THEN\n"
    "      list_transform(range(len(toks) - 2),\n"
    "                     i -> array_to_string(toks[i + 1 : i + 3], ' '))\n"
    "    ELSE CAST([] AS VARCHAR[]) END)) AS shingle\n"
    "  FROM toks_t)"
)

_JACCARD_CTES = (
    f"{TOKS_CTE},\n{_SHINGLES_CTE},\n"
    "sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),\n"
    "inter AS MATERIALIZED (\n"
    "  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c\n"
    "  FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.doc_id < y.doc_id\n"
    "  GROUP BY x.doc_id, y.doc_id),\n"
    "jac AS MATERIALIZED (\n"
    "  SELECT i.a, i.b, round(i.c / (sa.n_sh + sb.n_sh - i.c), 6) AS jaccard\n"
    "  FROM inter i JOIN sizes sa ON sa.doc_id = i.a\n"
    "               JOIN sizes sb ON sb.doc_id = i.b)"
)


def contamination_sql(threshold: float = 0.15, bench_mod: int = 29) -> str:
    """Mirror of operators.dedup.contamination_report with the entry
    query's deterministic corpus/benchmark split (doc_id % mod == 0 →
    benchmark)."""
    return (
        f"WITH {TOKS_CTE},\n{_SHINGLES_CTE},\n"
        f"shd AS MATERIALIZED (SELECT * FROM sh WHERE doc_id % {bench_mod} <> 0),\n"
        f"shb AS MATERIALIZED (SELECT doc_id AS bench_id, shingle FROM sh"
        f" WHERE doc_id % {bench_mod} = 0),\n"
        "sizes AS MATERIALIZED (\n"
        "  SELECT doc_id, count(*) AS n_shingles FROM shd GROUP BY doc_id),\n"
        "shared AS MATERIALIZED (\n"
        "  SELECT d.doc_id, b.bench_id, count(*) AS shared\n"
        "  FROM shd d JOIN shb b ON b.shingle = d.shingle\n"
        "  GROUP BY d.doc_id, b.bench_id),\n"
        "best AS MATERIALIZED (\n"
        "  SELECT doc_id, bench_id, shared FROM (\n"
        "    SELECT doc_id, bench_id, shared,\n"
        "      row_number() OVER (PARTITION BY doc_id\n"
        "        ORDER BY shared DESC, bench_id ASC) AS rn\n"
        "    FROM shared) WHERE rn = 1)\n"
        "SELECT b.doc_id, b.bench_id, CAST(b.shared AS BIGINT) AS shared,\n"
        "  CAST(s.n_shingles AS BIGINT) AS n_shingles,\n"
        "  round(b.shared / s.n_shingles, 6) AS containment\n"
        "FROM best b JOIN sizes s ON s.doc_id = b.doc_id\n"
        f"WHERE round(b.shared / s.n_shingles, 6) >= {threshold}"
    )


def ngram_jaccard_sql(threshold: float = 0.3,
                      max_doc_freq: float | None = None) -> str:
    """``max_doc_freq`` mirrors the Spark stop-shingle filter exactly
    (drop shingles in > floor(f·N) docs from the self-join; set sizes keep
    every shingle), so Spark/SQL equality holds whatever gets dropped."""
    if max_doc_freq is None:
        return (
            f"WITH {_JACCARD_CTES}\n"
            f"SELECT a, b, jaccard FROM jac WHERE jaccard >= {threshold}"
        )
    cap = (
        f"CAST(floor({max_doc_freq} * (SELECT count(*) FROM documents)) AS BIGINT)"
    )
    filtered = _JACCARD_CTES.replace(
        "inter AS MATERIALIZED (\n"
        "  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c\n"
        "  FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.doc_id < y.doc_id\n"
        "  GROUP BY x.doc_id, y.doc_id),",
        "hot AS MATERIALIZED (\n"
        f"  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {cap}),\n"
        "shf AS MATERIALIZED (\n"
        "  SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),\n"
        "inter AS MATERIALIZED (\n"
        "  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c\n"
        "  FROM shf x JOIN shf y ON y.shingle = x.shingle AND x.doc_id < y.doc_id\n"
        "  GROUP BY x.doc_id, y.doc_id),",
    )
    assert "hot AS MATERIALIZED" in filtered
    return (
        f"WITH {filtered}\n"
        f"SELECT a, b, jaccard FROM jac WHERE jaccard >= {threshold}"
    )


def containment_pairs_sql(
    threshold: float = 0.5, max_doc_freq: float | None = 0.01
) -> str:
    """Mirror of operators.dedup.containment_pairs: asymmetric shingle
    containment c / least(na, nb) with the identical df-cap discipline
    (capped shingles leave the self-join, sizes keep every shingle)."""
    if max_doc_freq is None:
        inter = (
            "inter AS MATERIALIZED (\n"
            "  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c\n"
            "  FROM sh x JOIN sh y ON y.shingle = x.shingle"
            " AND x.doc_id < y.doc_id\n"
            "  GROUP BY x.doc_id, y.doc_id)"
        )
    else:
        cap = (
            f"CAST(floor({max_doc_freq} * (SELECT count(*) FROM documents))"
            " AS BIGINT)"
        )
        inter = (
            "hot AS MATERIALIZED (\n"
            f"  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {cap}),\n"
            "shf AS MATERIALIZED (\n"
            "  SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),\n"
            "inter AS MATERIALIZED (\n"
            "  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c\n"
            "  FROM shf x JOIN shf y ON y.shingle = x.shingle"
            " AND x.doc_id < y.doc_id\n"
            "  GROUP BY x.doc_id, y.doc_id)"
        )
    return (
        f"WITH {TOKS_CTE},\n{_SHINGLES_CTE},\n"
        "sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh"
        " FROM sh GROUP BY doc_id),\n"
        f"{inter}\n"
        "SELECT i.a, i.b,\n"
        "  CAST(sa.n_sh AS BIGINT) AS na, CAST(sb.n_sh AS BIGINT) AS nb,\n"
        "  CAST(i.c AS BIGINT) AS c,\n"
        "  round(CAST(i.c AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)"
        " AS containment\n"
        "FROM inter i JOIN sizes sa ON sa.doc_id = i.a\n"
        "             JOIN sizes sb ON sb.doc_id = i.b\n"
        f"WHERE round(CAST(i.c AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)"
        f" >= {threshold}"
    )


def winnow_fingerprints_sql(k: int = 3, w: int = 4) -> str:
    """Mirror of operators.dedup.winnow_fingerprints: identical k-gram
    hash48 array, rightmost-window-min selection, sorted pos:hash
    digest (list slices are 1-based inclusive on both engines here)."""
    win = (
        f"hs[CAST(j AS INT):CAST(j AS INT) + least({w}, len(hs)) - 1]"
    )
    sel = (
        f"list_sort(list_distinct(list_transform("
        f"range(1, len(hs) - least({w}, len(hs)) + 2), j ->\n"
        f"  CAST(j + least({w}, len(hs)) -"
        f" list_position(list_reverse({win}), list_min({win}))"
        f" AS VARCHAR)\n"
        f"  || ':' || CAST(list_min({win}) AS VARCHAR))))"
    )
    gram = _h48(
        f"array_to_string(toks[CAST(i AS INT):CAST(i AS INT) + {k - 1}],"
        " chr(31))"
    )
    return (
        f"WITH {TOKS_CTE},\n"
        "h AS MATERIALIZED (SELECT doc_id, len(toks) AS n,\n"
        f"  list_transform(range(1, len(toks) - {k} + 2), i -> {gram})"
        " AS hs\n"
        "  FROM toks_t),\n"
        "s AS (SELECT doc_id, n,\n"
        f"  CASE WHEN n >= {k} THEN {sel} END AS sel\n"
        "  FROM h)\n"
        "SELECT doc_id,\n"
        f"  CAST(CASE WHEN n >= {k} THEN n - {k} + 1 ELSE 0 END AS BIGINT)"
        " AS n_grams,\n"
        "  CAST(COALESCE(len(sel), 0) AS BIGINT) AS n_fps,\n"
        "  md5(array_to_string(sel, chr(31))) AS winnow_md5\n"
        "FROM s"
    )


def _minhash_lsh_ctes(num_hashes: int = 8, bands: int = 4) -> str:
    """CTE chain ending in ``cand`` (LSH candidate pairs) + ``jac``."""
    rows = num_hashes // bands
    hcols = ",\n    ".join(
        "min({h}) AS h{k}".format(h=_h48(f"'{k}' || chr(31) || shingle"), k=k)
        for k in range(num_hashes)
    )
    band_exprs = ",\n    ".join(
        "md5(concat_ws(chr(31), '{b}', {parts})) AS band{b}".format(
            b=b,
            parts=", ".join(
                f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    band_list = ", ".join(f"band{b}" for b in range(bands))
    return (
        f"{_JACCARD_CTES},\n"
        f"sig AS MATERIALIZED (SELECT doc_id,\n    {hcols}\n  FROM sh GROUP BY doc_id),\n"
        f"banded AS MATERIALIZED (SELECT doc_id,\n    {band_exprs}\n  FROM sig),\n"
        f"stacked AS MATERIALIZED (SELECT doc_id, unnest([{band_list}]) AS bucket FROM banded),\n"
        "cand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b\n"
        "         FROM stacked x JOIN stacked y ON y.bucket = x.bucket\n"
        "         AND x.doc_id < y.doc_id)"
    )


def conv_dedup_minhash_sql(num_hashes: int = 8, bands: int = 4) -> str:
    """Mirror of the conv_dedup_minhash entry: conversations become
    documents (turns concatenated in turn_idx order), then the shared
    MinHash-LSH CTE chain runs verbatim — the ``documents`` CTE
    deliberately SHADOWS the base view, so the whole dedup oracle is
    reused untouched."""
    conv_doc = (
        "documents AS MATERIALIZED (\n"
        "  SELECT conv_id AS doc_id,\n"
        "    string_agg(text, ' ' ORDER BY turn_idx) AS text\n"
        "  FROM transcripts GROUP BY conv_id)"
    )
    body = (
        f", {conv_doc},\n{_minhash_lsh_ctes(num_hashes, bands)}\n"
        "SELECT cand.a, cand.b, COALESCE(j.jaccard, 0.0) AS jaccard\n"
        "FROM cand LEFT JOIN jac j ON j.a = cand.a AND j.b = cand.b"
    )
    return _graph_query(body)


def minhash_lsh_sql(num_hashes: int = 8, bands: int = 4) -> str:
    return (
        f"WITH {_minhash_lsh_ctes(num_hashes, bands)}\n"
        "SELECT cand.a, cand.b, COALESCE(j.jaccard, 0.0) AS jaccard\n"
        "FROM cand LEFT JOIN jac j ON j.a = cand.a AND j.b = cand.b"
    )


def minhash_lsh_recall_sql(
    tau: float = 0.05, num_hashes: int = 8, bands: int = 4
) -> str:
    """Mirror of operators.dedup.minhash_lsh_recall: exact unfiltered
    shingle-Jaccard truth at >= tau vs LSH-candidate pairs verifying at
    >= tau; identical round(.,6) jaccard on both sides of the compare."""
    return (
        f"WITH {_minhash_lsh_ctes(num_hashes, bands)},\n"
        f"truth AS MATERIALIZED (\n"
        f"  SELECT a, b FROM jac WHERE jaccard >= {tau}),\n"
        f"found AS MATERIALIZED (\n"
        f"  SELECT cand.a, cand.b FROM cand\n"
        f"  LEFT JOIN jac j ON j.a = cand.a AND j.b = cand.b\n"
        f"  WHERE COALESCE(j.jaccard, 0.0) >= {tau}),\n"
        f"hits AS MATERIALIZED (\n"
        f"  SELECT f.a, f.b FROM found f\n"
        f"  JOIN truth t ON t.a = f.a AND t.b = f.b)\n"
        f"SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,\n"
        f"  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,\n"
        f"  CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,\n"
        f"  CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 0.0\n"
        f"       ELSE round((SELECT count(*) FROM hits)\n"
        f"            / (SELECT count(*) FROM truth), 6) END AS recall"
    )


def split_leakage_sql(
    threshold: float = 0.3,
    num_hashes: int = 8,
    bands: int = 4,
    salt: str = "split",
    splits: tuple = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
) -> str:
    """Mirror of operators.dedup.split_leakage: LSH-verified pairs at
    >= threshold classified by the identical hash-split assignment."""
    h = _h48(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    cases, cum = [], 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cases.append(f"WHEN h < {int(cum * (1 << 48))} THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"
    return (
        f"WITH {_minhash_lsh_ctes(num_hashes, bands)},\n"
        f"dpairs AS MATERIALIZED (\n"
        f"  SELECT cand.a, cand.b FROM cand\n"
        f"  LEFT JOIN jac j ON j.a = cand.a AND j.b = cand.b\n"
        f"  WHERE COALESCE(j.jaccard, 0.0) >= {threshold}),\n"
        f"sp AS MATERIALIZED (SELECT doc_id, {case} AS split\n"
        f"  FROM (SELECT doc_id, {h} AS h FROM documents))\n"
        f"SELECT pair_class, CAST(count(*) AS BIGINT) AS n_pairs FROM (\n"
        f"  SELECT CASE WHEN x.split = y.split\n"
        f"    THEN 'within_' || x.split ELSE 'cross' END AS pair_class\n"
        f"  FROM dpairs p JOIN sp x ON x.doc_id = p.a\n"
        f"  JOIN sp y ON y.doc_id = p.b)\n"
        f"GROUP BY pair_class"
    )


def dedup_clusters_sql(threshold: float = 0.3, num_hashes: int = 8,
                       bands: int = 4) -> str:
    """Near-dup clusters: transitive closure (recursive CTE) over the LSH
    candidate pairs that verify at >= threshold — the fixpoint the Spark
    side computes with connected_components_fast over the pair graph."""
    return (
        f"WITH RECURSIVE {_minhash_lsh_ctes(num_hashes, bands)},\n"
        "dpairs AS MATERIALIZED (\n"
        "  SELECT cand.a, cand.b FROM cand\n"
        "  LEFT JOIN jac j ON j.a = cand.a AND j.b = cand.b\n"
        f"  WHERE COALESCE(j.jaccard, 0.0) >= {threshold}),\n"
        "du AS MATERIALIZED (SELECT a AS s, b AS d FROM dpairs\n"
        "  UNION SELECT b AS s, a AS d FROM dpairs),\n"
        "reach(id, r) AS (\n"
        "  SELECT doc_id, doc_id FROM documents\n"
        "  UNION\n"
        "  SELECT u.d, reach.r FROM reach JOIN du u ON u.s = reach.id)\n"
        "SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster\n"
        "FROM reach GROUP BY id"
    )


def dedup_representatives_sql(threshold: float = 0.3, num_hashes: int = 8,
                              bands: int = 4) -> str:
    """Mirror of operators.dedup.dedup_representatives: the cluster
    recursive CTE plus the quality score, ranked per cluster by (quality
    DESC, doc_id ASC) — both engines rank the 6dp-rounded score, so the
    winner is deterministic."""
    mean_len = (
        "CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)"
        " / greatest(len(toks), 1)"
    )
    return (
        f"WITH RECURSIVE {_minhash_lsh_ctes(num_hashes, bands)},\n"
        "dpairs AS MATERIALIZED (\n"
        "  SELECT cand.a, cand.b FROM cand\n"
        "  LEFT JOIN jac j ON j.a = cand.a AND j.b = cand.b\n"
        f"  WHERE COALESCE(j.jaccard, 0.0) >= {threshold}),\n"
        "du AS MATERIALIZED (SELECT a AS s, b AS d FROM dpairs\n"
        "  UNION SELECT b AS s, a AS d FROM dpairs),\n"
        "reach(id, r) AS (\n"
        "  SELECT doc_id, doc_id FROM documents\n"
        "  UNION\n"
        "  SELECT u.d, reach.r FROM reach JOIN du u ON u.s = reach.id),\n"
        "clus AS MATERIALIZED (SELECT id AS doc_id,"
        " CAST(min(r) AS BIGINT) AS cluster FROM reach GROUP BY id),\n"
        # toks_t already exists inside _minhash_lsh_ctes — reuse it
        "qual AS MATERIALIZED (SELECT doc_id,\n"
        f"  round(0.2 + 1.5 * ({_STOP_RATIO}) + 0.02 * ({mean_len})\n"
        "        + 0.1 * ln(1 + len(toks)), 6) AS quality\n"
        "  FROM toks_t),\n"
        "ranked AS (SELECT c.cluster, c.doc_id, q.quality,\n"
        "  row_number() OVER (PARTITION BY c.cluster\n"
        "    ORDER BY q.quality DESC, c.doc_id ASC) AS rn,\n"
        "  count(*) OVER (PARTITION BY c.cluster) AS n_docs\n"
        "  FROM clus c JOIN qual q ON q.doc_id = c.doc_id)\n"
        "SELECT cluster, doc_id AS rep_doc_id,\n"
        "  CAST(n_docs AS BIGINT) AS n_docs, quality AS rep_quality\n"
        "FROM ranked WHERE rn = 1"
    )


def curate_pack_sql(
    threshold: float = 0.3,
    min_quality: float = 0.75,
    max_tokens: int = 256,
    num_shards: int = 4,
) -> str:
    """Mirror of the end-to-end curation pipeline: near-dup
    representatives (the full dedup_representatives_sql as a nested CTE),
    an absolute quality floor on the 6dp-rounded score, then the packing
    manifest over the surviving docs only."""
    reps = dedup_representatives_sql(threshold)
    return (
        f"WITH reps AS MATERIALIZED (\n{reps}\n),\n"
        "keep AS MATERIALIZED (SELECT rep_doc_id AS doc_id FROM reps\n"
        f"  WHERE rep_quality >= {min_quality}),\n"
        "kt AS MATERIALIZED (SELECT d.doc_id,\n"
        "  list_filter(string_split_regex(lower(d.text), '\\s+'), x -> x <> '')"
        " AS toks\n"
        "  FROM documents d JOIN keep k ON k.doc_id = d.doc_id),\n"
        "nt AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n\n"
        "  FROM kt WHERE len(toks) > 0),\n"
        "sh AS MATERIALIZED (SELECT doc_id, n,\n"
        f"  {_h48('CAST(doc_id AS VARCHAR)')} % {num_shards} AS shard"
        " FROM nt),\n"
        "c AS (SELECT doc_id, shard, n,\n"
        "  sum(n) OVER (PARTITION BY shard ORDER BY doc_id) AS e FROM sh)\n"
        "SELECT doc_id, shard, n AS n_tokens,\n"
        "  CAST(e - n AS BIGINT) AS start_tok, CAST(e AS BIGINT) AS end_tok,\n"
        f"  CAST((e - n) // {max_tokens} AS BIGINT) AS first_bin,\n"
        f"  CAST((e - 1) // {max_tokens} AS BIGINT) AS last_bin\n"
        "FROM c"
    )


def _simhash_ctes(bits: int = 32) -> str:
    """CTE chain ending in ``sig`` (doc_id, simhash)."""
    votes = ",\n    ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return (
        f"{TOKS_CTE},\n"
        "tok AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM toks_t),\n"
        f"h AS MATERIALIZED (SELECT doc_id, {_h48('t')} AS h FROM tok),\n"
        f"votes AS MATERIALIZED (SELECT doc_id,\n    {votes}\n  FROM h GROUP BY doc_id),\n"
        f"sig AS MATERIALIZED (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes)"
    )


def simhash_sql(bits: int = 32) -> str:
    return (
        f"WITH {_simhash_ctes(bits)}\n"
        "SELECT doc_id, simhash FROM sig"
    )


def simhash_hamming_sql(bits: int = 32) -> str:
    """Mirror of operators.dedup.simhash_hamming_pairs: signature +
    single-bit-flip probes equi-joined against exact signatures, xor
    bit_count as the witness, double discovery deduped."""
    flips = ", ".join(f"xor(simhash, {1 << j})" for j in range(bits))
    return (
        f"WITH {_simhash_ctes(bits)},\n"
        "probes AS MATERIALIZED (\n"
        "  SELECT doc_id AS a, simhash AS sig_a,\n"
        f"    unnest([simhash, {flips}]) AS probe\n"
        "  FROM sig)\n"
        "SELECT DISTINCT p.a, o.doc_id AS b,\n"
        "  CAST(bit_count(xor(sig_a, probe)) AS BIGINT) AS hamming\n"
        "FROM probes p JOIN sig o ON o.simhash = p.probe\n"
        "WHERE p.a < o.doc_id"
    )


_EMB_D = (
    "e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "FROM embeddings)"
)

_COS = (
    "round(list_inner_product(q.v, c.v) / "
    "(sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))), 6)"
)


def ann_cosine_topk_sql(k: int = 5, num_queries: int = 20) -> str:
    return (
        f"WITH {_EMB_D},\n"
        f"q AS MATERIALIZED (SELECT * FROM e WHERE vec_id < {num_queries}),\n"
        "scored AS MATERIALIZED (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS sim\n"
        "  FROM q JOIN e c ON c.vec_id <> q.vec_id)\n"
        "SELECT query_id, neighbor_id, rank, sim FROM (\n"
        "  SELECT *, CAST(row_number() OVER (PARTITION BY query_id\n"
        "    ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank FROM scored)\n"
        f"WHERE rank <= {k}"
    )


def ann_lsh_topk_sql(k: int = 3, num_bits: int = 8, num_queries: int = 20) -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(num_bits)
    )
    return (
        "WITH eb AS MATERIALIZED (SELECT vec_id,\n"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,\n"
        f"  CAST({bucket} AS BIGINT) AS bucket FROM embeddings),\n"
        f"q AS MATERIALIZED (SELECT * FROM eb WHERE vec_id < {num_queries}),\n"
        "scored AS MATERIALIZED (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS sim\n"
        "  FROM q JOIN eb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)\n"
        "SELECT query_id, neighbor_id, rank, sim FROM (\n"
        "  SELECT *, CAST(row_number() OVER (PARTITION BY query_id\n"
        "    ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank FROM scored)\n"
        f"WHERE rank <= {k}"
    )


def ann_lsh_recall_sql(k: int = 5, num_bits: int = 8, num_queries: int = 20) -> str:
    """Mirror of operators.similarity.lsh_recall: brute-force top-k and
    LSH-bucket top-k as CTEs, intersected per query.  Integer hit counts
    are hash-exact; recall rides as one rounded division."""
    bucket = " + ".join(
        f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(num_bits)
    )
    return (
        "WITH eb AS MATERIALIZED (SELECT vec_id,\n"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,\n"
        f"  CAST({bucket} AS BIGINT) AS bucket FROM embeddings),\n"
        f"q AS MATERIALIZED (SELECT * FROM eb WHERE vec_id < {num_queries}),\n"
        "truth AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        f"    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS sim,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        "        ORDER BY "
        f"{_COS} DESC, c.vec_id ASC) AS rank\n"
        "    FROM q JOIN eb c ON c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "approx AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        f"    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS sim,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        "        ORDER BY "
        f"{_COS} DESC, c.vec_id ASC) AS rank\n"
        "    FROM q JOIN eb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "nt AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY query_id),\n"
        "na AS (SELECT query_id, count(*) AS n_approx FROM approx GROUP BY query_id),\n"
        "h AS (SELECT t.query_id, count(*) AS n_hits\n"
        "  FROM truth t JOIN approx a\n"
        "    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id\n"
        "  GROUP BY t.query_id)\n"
        "SELECT nt.query_id, CAST(nt.n_truth AS BIGINT) AS n_truth,\n"
        "  CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,\n"
        "  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,\n"
        "  round(COALESCE(h.n_hits, 0) / nt.n_truth, 6) AS recall\n"
        "FROM nt LEFT JOIN na ON na.query_id = nt.query_id\n"
        "LEFT JOIN h ON h.query_id = nt.query_id"
    )


def embedding_health_sql() -> str:
    """Mirror of operators.similarity.embedding_health: micro-quantized
    norms (sqrt correctly rounded in both engines), pre-quantization
    finiteness flags, the grouped_quantiles discrete median rank."""
    qx = (
        "CASE WHEN isnan(CAST(x AS DOUBLE))"
        " OR abs(CAST(x AS DOUBLE)) > 1e300 THEN CAST(0 AS BIGINT)"
        " ELSE CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) END"
    )
    return (
        "WITH eh AS MATERIALIZED (\n"
        "  SELECT vec_id,\n"
        "    list_sum(list_transform(embedding, x ->\n"
        "      CASE WHEN isnan(CAST(x AS DOUBLE))\n"
        "        OR abs(CAST(x AS DOUBLE)) > 1e300 THEN 1 ELSE 0 END))"
        " AS bad,\n"
        "    CAST(round(sqrt(CAST(list_sum(list_transform(\n"
        f"      list_transform(embedding, x -> {qx}),\n"
        "      q -> q * q)) AS DOUBLE)), 0) AS BIGINT) AS norm_micros\n"
        "  FROM embeddings),\n"
        "eh_st AS MATERIALIZED (SELECT\n"
        "  CAST(count(*) AS BIGINT) AS n_vectors,\n"
        "  CAST(SUM(CASE WHEN norm_micros = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_zero,\n"
        "  CAST(SUM(CASE WHEN bad > 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_nonfinite,\n"
        "  CAST(MIN(norm_micros) AS BIGINT) AS min_norm,\n"
        "  CAST(MAX(norm_micros) AS BIGINT) AS max_norm FROM eh),\n"
        "eh_rk AS MATERIALIZED (SELECT norm_micros,\n"
        "  row_number() OVER (ORDER BY norm_micros) AS rn FROM eh),\n"
        "eh_med AS (SELECT CAST(MAX(norm_micros) AS BIGINT) AS p50_norm\n"
        "  FROM eh_rk, eh_st WHERE rn = (n_vectors * 50 + 99) // 100)\n"
        "SELECT n_vectors, n_zero, n_nonfinite,"
        " min_norm, p50_norm, max_norm\n"
        "FROM eh_st, eh_med"
    )


def matryoshka_recall_sql(
    k: int = 5, dims: int = 16, num_queries: int = 20
) -> str:
    """Mirror of operators.similarity.matryoshka_recall: brute-force
    top-k on the full vectors and on the first ``dims`` coordinates as
    CTEs, intersected per query (the ann_lsh_recall_sql shape with a
    list-slice instead of a bucket)."""
    cos_t = (
        "round(list_inner_product(q.v, c.v) / "
        "(sqrt(list_inner_product(q.v, q.v)) * "
        "sqrt(list_inner_product(c.v, c.v))), 6)"
    )
    cos_a = (
        "round(list_inner_product(q.vt, c.vt) / "
        "(sqrt(list_inner_product(q.vt, q.vt)) * "
        "sqrt(list_inner_product(c.vt, c.vt))), 6)"
    )
    return (
        "WITH mr_eb AS MATERIALIZED (SELECT vec_id,\n"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,\n"
        f"  list_transform(embedding[1:{dims}],"
        " x -> CAST(x AS DOUBLE)) AS vt\n"
        "  FROM embeddings),\n"
        f"mr_q AS MATERIALIZED (SELECT * FROM mr_eb"
        f" WHERE vec_id < {num_queries}),\n"
        "mr_truth AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        "    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        f"        ORDER BY {cos_t} DESC, c.vec_id ASC) AS rank\n"
        "    FROM mr_q q JOIN mr_eb c ON c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "mr_approx AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        "    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        f"        ORDER BY {cos_a} DESC, c.vec_id ASC) AS rank\n"
        "    FROM mr_q q JOIN mr_eb c ON c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "mr_nt AS (SELECT query_id, count(*) AS n_truth"
        " FROM mr_truth GROUP BY query_id),\n"
        "mr_na AS (SELECT query_id, count(*) AS n_approx"
        " FROM mr_approx GROUP BY query_id),\n"
        "mr_h AS (SELECT t.query_id, count(*) AS n_hits\n"
        "  FROM mr_truth t JOIN mr_approx a\n"
        "    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id\n"
        "  GROUP BY t.query_id)\n"
        "SELECT nt.query_id, CAST(nt.n_truth AS BIGINT) AS n_truth,\n"
        "  CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,\n"
        "  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,\n"
        "  round(COALESCE(h.n_hits, 0) / nt.n_truth, 6) AS recall\n"
        "FROM mr_nt nt LEFT JOIN mr_na na ON na.query_id = nt.query_id\n"
        "LEFT JOIN mr_h h ON h.query_id = nt.query_id"
    )


# micro-quantized embeddings + truncating-division centroid as a list
# (shared by centroid_outliers_sql / embedding_covariance_sql)
_CENTROID_CTES = (
    "co_q AS MATERIALIZED (SELECT vec_id,\n"
    "  list_transform(embedding, x ->\n"
    "    CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS v\n"
    "  FROM embeddings),\n"
    "co_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM co_q),\n"
    "co_s AS MATERIALIZED (\n"
    "  SELECT x.u.i AS i, CAST(SUM(x.u.x) AS BIGINT) AS s\n"
    "  FROM (SELECT unnest(list_transform(range(1, len(v) + 1),\n"
    "      i -> {'i': i, 'x': v[i]})) AS u FROM co_q) x\n"
    "  GROUP BY x.u.i),\n"
    "co_c AS MATERIALIZED (\n"
    "  SELECT i, CAST(s // n AS BIGINT) AS c FROM co_s, co_n),\n"
    "co_cl AS MATERIALIZED (SELECT list(c ORDER BY i) AS cv FROM co_c)"
)


def centroid_outliers_sql(k: int = 20) -> str:
    """Mirror of operators.similarity.centroid_outliers: micro-unit
    quantization, per-dimension HUGEINT-safe sums, truncating centroid
    division (DuckDB ``//`` == Spark ``div``, toward zero), exact BIGINT
    squared distances, (dist DESC, vec_id ASC) top-k."""
    return (
        f"WITH {_CENTROID_CTES},\n"
        "co_d AS MATERIALIZED (\n"
        "  SELECT vec_id, CAST(list_sum(list_transform(\n"
        "    range(1, len(v) + 1),"
        " j -> (v[j] - cv[j]) * (v[j] - cv[j]))) AS BIGINT) AS dist_sq\n"
        "  FROM co_q, co_cl)\n"
        "SELECT vec_id, dist_sq,\n"
        "  CAST(row_number() OVER (ORDER BY dist_sq DESC, vec_id ASC)"
        " AS INT) AS rank\n"
        f"FROM co_d ORDER BY dist_sq DESC, vec_id ASC LIMIT {k}"
    )


def embedding_covariance_sql(k: int = 20) -> str:
    """Mirror of operators.similarity.embedding_covariance_topk: the
    shared centered-micro CTEs, exact BIGINT pair products over j > i,
    (|cov| DESC, i, j) top-k."""
    return (
        f"WITH {_CENTROID_CTES},\n"
        "ec_x AS MATERIALIZED (\n"
        "  SELECT list_transform(range(1, len(v) + 1),"
        " t -> v[t] - cv[t]) AS xv\n"
        "  FROM co_q, co_cl),\n"
        "ec_p AS MATERIALIZED (\n"
        "  SELECT CAST(ti.i - 1 AS BIGINT) AS i,"
        " CAST(tj.j - 1 AS BIGINT) AS j,\n"
        "    CAST(SUM(xv[ti.i] * xv[tj.j]) AS BIGINT) AS cov_sum\n"
        "  FROM ec_x,\n"
        "    UNNEST(range(1, len(xv) + 1)) AS ti(i),\n"
        "    UNNEST(range(1, len(xv) + 1)) AS tj(j)\n"
        "  WHERE tj.j > ti.i GROUP BY ti.i, tj.j)\n"
        "SELECT i, j, cov_sum,\n"
        "  CAST(row_number() OVER (ORDER BY abs(cov_sum) DESC, i, j)"
        " AS INT) AS rank\n"
        f"FROM ec_p ORDER BY abs(cov_sum) DESC, i, j LIMIT {k}"
    )


def behavior_entropy_sql() -> str:
    """Mirror of operators.cooccurrence.behavior_entropy: identical lag
    chain and counts, each p·ln(p) term rounded once to micros from the
    exact integer ratio, BIGINT sum negated."""
    return (
        "WITH be_pr AS MATERIALIZED (SELECT\n"
        "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts,"
        " event_id) AS a,\n"
        "  event_type AS b FROM events),\n"
        "be_c AS MATERIALIZED (SELECT a, b,"
        " CAST(count(*) AS BIGINT) AS n\n"
        "  FROM be_pr WHERE a IS NOT NULL GROUP BY a, b),\n"
        "be_t AS MATERIALIZED (SELECT a,"
        " CAST(sum(n) AS BIGINT) AS tot FROM be_c GROUP BY a),\n"
        "be_j AS MATERIALIZED (\n"
        "  SELECT c.a, c.n, t.tot,\n"
        "    CAST(round((CAST(c.n AS DOUBLE) / t.tot)\n"
        "      * ln(CAST(c.n AS DOUBLE) / t.tot) * 1000000, 0)"
        " AS BIGINT) AS term\n"
        "  FROM be_c c JOIN be_t t USING (a))\n"
        "SELECT a AS state, CAST(count(*) AS BIGINT) AS n_next,\n"
        "  CAST(max(tot) AS BIGINT) AS tot,\n"
        "  CAST(-SUM(term) AS BIGINT) AS entropy_micros\n"
        "FROM be_j GROUP BY a"
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def bloom_semijoin_sql(
    build_type: str = "purchase",
    num_hashes: int = 2,
    num_bits: int = 256,
    salt: str = "bloom",
    min_value: float = 200.0,
) -> str:
    """Mirror of operators.bloomjoin.bloom_semi_join_stats: the bitmap
    test 'all k positions set' is expressed as k IN-subqueries against
    the distinct build-side position set — bit-for-bit the same admitted
    rows as the Spark side's literal-bitmap filter."""
    def pos(i: int, key: str = "user_id") -> str:
        return (
            _h48(f"'{salt}:{i}:' || CAST({key} AS VARCHAR)") + f" % {num_bits}"
        )

    build_pos = "\n    UNION ALL\n    ".join(
        f"SELECT {pos(i)} AS pos FROM small" for i in range(num_hashes)
    )
    probe_pos = ",\n    ".join(
        f"{pos(i)} AS p{i}" for i in range(num_hashes)
    )
    cand_cond = " AND ".join(
        f"p{i} IN (SELECT pos FROM bits)" for i in range(num_hashes)
    )
    return f"""
WITH small AS MATERIALIZED (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = '{build_type}' AND value > {min_value}),
bits AS MATERIALIZED (
  SELECT DISTINCT pos FROM (
    {build_pos})),
pe AS MATERIALIZED (
  SELECT event_type, user_id,
    {probe_pos}
  FROM events),
cand AS MATERIALIZED (SELECT event_type FROM pe WHERE {cand_cond}),
ex AS MATERIALIZED (
  SELECT event_type FROM events
  WHERE user_id IN (SELECT user_id FROM small))
SELECT t.event_type,
  CAST(t.total AS BIGINT) AS total,
  CAST(COALESCE(c.n, 0) AS BIGINT) AS bloom_candidates,
  CAST(COALESCE(e.n, 0) AS BIGINT) AS exact_matches,
  CAST(COALESCE(c.n, 0) - COALESCE(e.n, 0) AS BIGINT) AS false_positives
FROM (SELECT event_type, count(*) AS total FROM events GROUP BY event_type) t
LEFT JOIN (SELECT event_type, count(*) AS n FROM cand GROUP BY event_type) c
  ON c.event_type = t.event_type
LEFT JOIN (SELECT event_type, count(*) AS n FROM ex GROUP BY event_type) e
  ON e.event_type = t.event_type
"""


def conversation_stats_sql() -> str:
    """Per-conversation summary over the transcript adapter — the first
    table a transcripts user materializes."""
    return _graph_query(
        "SELECT conv_id,\n"
        "  CAST(count(*) AS BIGINT) AS n_turns,\n"
        "  CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_user,\n"
        "  CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_assistant,\n"
        "  CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_tool,\n"
        "  CAST(count(DISTINCT tool) AS BIGINT) AS n_distinct_tools,\n"
        "  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)"
        " AS duration_us\n"
        "FROM transcripts GROUP BY conv_id"
    )


def bigram_next_topk_sql(k: int = 3, min_count: int = 2) -> str:
    """Mirror of operators.ngram_lm.bigram_next_topk over documents."""
    return f"""
WITH {TOKS_CTE},
bg AS MATERIALIZED (
  SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM toks_t, UNNEST(range(1, len(toks))) AS t(i)),
cnt AS MATERIALIZED (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs
  FROM bg GROUP BY w1, w2
  HAVING count(*) >= {min_count})
SELECT w1, w2, n_pairs, CAST(rn AS BIGINT) AS rn FROM (
  SELECT w1, w2, n_pairs,
         row_number() OVER (PARTITION BY w1
           ORDER BY n_pairs DESC, w2 ASC) AS rn
  FROM cnt)
WHERE rn <= {k}
"""


def doc_bigram_hit_rate_sql(min_count: int = 2) -> str:
    """Mirror of operators.ngram_lm.doc_bigram_hit_rate: per-document
    known-bigram fraction in integer micro-units."""
    return f"""
WITH {TOKS_CTE},
bg AS MATERIALIZED (
  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM toks_t, UNNEST(range(1, len(toks))) AS t(i)),
cnt AS MATERIALIZED (
  SELECT w1, w2 FROM bg GROUP BY w1, w2 HAVING count(*) >= {min_count}),
per AS MATERIALIZED (
  SELECT b.doc_id, count(*) AS n_bigrams,
         sum(CASE WHEN c.w1 IS NOT NULL THEN 1 ELSE 0 END) AS n_known
  FROM bg b LEFT JOIN cnt c ON c.w1 = b.w1 AND c.w2 = b.w2
  GROUP BY b.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(p.n_known, 0) AS BIGINT) AS n_known,
       CAST(CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN 0
            ELSE (1000000 * p.n_known) // p.n_bigrams END AS BIGINT)
         AS hit_micros
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
"""


def partition_histogram_sql(key: str = "user_id", buckets: int = 32) -> str:
    """Mirror of operators.profiling.partition_histogram over events."""
    b = _h48(f"CAST({key} AS VARCHAR)") + f" % {buckets}"
    return (
        "SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,\n"
        "  CAST(count(DISTINCT k) AS BIGINT) AS n_keys\n"
        f"FROM (SELECT {b} AS bucket, {key} AS k FROM events)\n"
        "GROUP BY bucket"
    )


def heavy_hitters_sql(key: str = "user_id", k: int = 20) -> str:
    """Mirror of operators.profiling.heavy_hitters over events — the
    (count DESC, key ASC) tie-break makes the k-row SET engine-exact."""
    return (
        f"SELECT {key} AS key, CAST(count(*) AS BIGINT) AS n_rows\n"
        f"FROM events GROUP BY {key}\n"
        f"ORDER BY n_rows DESC, key ASC LIMIT {k}"
    )


def sample_stratified_sql(rates: dict[str, float], salt: str = "sample") -> str:
    """Mirror of operators.packing.sample_stratified over events
    stratified by event_type, keyed by event_id."""
    whens = "\n".join(
        f"    WHEN '{s}' THEN CAST({int(r * (1 << 48))} AS BIGINT)"
        for s, r in rates.items()
    )
    h = _h48(f"'{salt}' || ':' || CAST(event_id AS VARCHAR)")
    return (
        "SELECT event_id, event_type FROM events\n"
        f"WHERE {h} < CASE event_type\n{whens}\n"
        "    ELSE CAST(0 AS BIGINT) END"
    )


def pack_documents_sql(max_tokens: int = 512, num_shards: int = 8) -> str:
    """Mirror of operators.packing.pack_documents: shard by
    hash48(doc_id), per-shard running token sum in doc_id order, window
    indices by integer division."""
    return (
        f"WITH {TOKS_CTE},\n"
        "nt AS MATERIALIZED (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n\n"
        "  FROM toks_t WHERE len(toks) > 0),\n"
        "sh AS MATERIALIZED (SELECT doc_id, n,\n"
        f"  {_h48('CAST(doc_id AS VARCHAR)')} % {num_shards} AS shard"
        " FROM nt),\n"
        "c AS (SELECT doc_id, shard, n,\n"
        "  sum(n) OVER (PARTITION BY shard ORDER BY doc_id) AS e FROM sh)\n"
        "SELECT doc_id, shard, n AS n_tokens,\n"
        "  CAST(e - n AS BIGINT) AS start_tok, CAST(e AS BIGINT) AS end_tok,\n"
        f"  CAST((e - n) // {max_tokens} AS BIGINT) AS first_bin,\n"
        f"  CAST((e - 1) // {max_tokens} AS BIGINT) AS last_bin\n"
        "FROM c"
    )


def build_vocab_sql(min_df: int = 1) -> str:
    """Mirror of operators.packing.build_vocab: global frequency rank
    (tf_total DESC, term ASC) as row_number - 1 — semantically identical
    to the distributed dense-id assignment."""
    return (
        f"WITH {TOKS_CTE},\n"
        "tok AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term FROM toks_t),\n"
        "terms AS MATERIALIZED (\n"
        "  SELECT term, CAST(count(*) AS BIGINT) AS tf_total,\n"
        "    CAST(count(DISTINCT doc_id) AS BIGINT) AS df\n"
        f"  FROM tok GROUP BY term HAVING count(DISTINCT doc_id) >= {min_df})\n"
        "SELECT term, tf_total, df,\n"
        "  CAST(row_number() OVER (ORDER BY tf_total DESC, term ASC) - 1"
        " AS BIGINT) AS vocab_id\n"
        "FROM terms"
    )


def vocab_coverage_sql(cutoffs: tuple[int, ...] = (256, 1024, 4096, 16384)) -> str:
    """Mirror of operators.packing.vocab_coverage: per-cutoff covered
    token mass of the frequency-ranked vocabulary, one integer div."""
    cuts = ", ".join(str(int(c)) for c in sorted(cutoffs))
    return (
        f"WITH v AS MATERIALIZED ({build_vocab_sql()}),\n"
        "tot AS (SELECT CAST(greatest(COALESCE(sum(tf_total), 0), 1)"
        " AS BIGINT) AS t FROM v),\n"
        "fanned AS (\n"
        "  SELECT CAST(c AS BIGINT) AS vocab_size, tf_total\n"
        f"  FROM v, UNNEST([{cuts}]) AS u(c)\n"
        "  WHERE vocab_id < c)\n"
        "SELECT vocab_size,\n"
        "  CAST(count(*) AS BIGINT) AS n_types,\n"
        "  CAST(sum(tf_total) AS BIGINT) AS covered_tokens,\n"
        "  CAST((1000000 * sum(tf_total)) // (SELECT t FROM tot)"
        " AS BIGINT) AS coverage_micros\n"
        "FROM fanned GROUP BY 1"
    )


def heaps_law_sql(deciles: int = 10) -> str:
    """Mirror of operators.packing.heaps_law: global token positions
    from a doc_id-ordered exclusive prefix-sum, first-occurrence
    positions, the per-decile cumulative type counts, and the log-log
    OLS slope with each ln term rounded to BIGINT micros BEFORE the
    sums (the powerlaw_alpha discipline; DuckDB sums BIGINTs in
    HUGEINT, still exact)."""
    return (
        "WITH hl_tok AS MATERIALIZED (\n"
        "  SELECT doc_id,\n"
        "    list_filter(string_split_regex(lower(text), '\\s+'),"
        " x -> x <> '') AS toks\n"
        "  FROM documents),\n"
        "hl_sz AS MATERIALIZED (SELECT doc_id,"
        " CAST(len(toks) AS BIGINT) AS nt FROM hl_tok),\n"
        "hl_start AS MATERIALIZED (\n"
        "  SELECT doc_id, CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS start\n"
        "  FROM hl_sz),\n"
        "hl_pos AS MATERIALIZED (\n"
        "  SELECT x.u.tok AS tok,"
        " CAST(s.start + x.u.i AS BIGINT) AS g\n"
        "  FROM (SELECT doc_id, unnest(list_transform(\n"
        "      range(1, len(toks) + 1),"
        " i -> {'i': i, 'tok': toks[i]})) AS u\n"
        "    FROM hl_tok) x\n"
        "  JOIN hl_start s ON s.doc_id = x.doc_id),\n"
        "hl_fp AS MATERIALIZED (SELECT tok,"
        " CAST(MIN(g) AS BIGINT) AS fpos FROM hl_pos GROUP BY tok),\n"
        "hl_tot AS MATERIALIZED (SELECT"
        " CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS n_total FROM hl_sz),\n"
        "hl_cp AS MATERIALIZED (\n"
        "  SELECT CAST(d.decile AS BIGINT) AS decile,\n"
        f"    CAST((t.n_total * d.decile) // {deciles} AS BIGINT)"
        " AS tokens_cum\n"
        f"  FROM hl_tot t, range(1, {deciles + 1}) d(decile)),\n"
        "hl_v AS MATERIALIZED (\n"
        "  SELECT c.decile, c.tokens_cum,"
        " CAST(count(*) AS BIGINT) AS vocab_cum\n"
        "  FROM hl_cp c JOIN hl_fp f ON f.fpos <= c.tokens_cum\n"
        "  GROUP BY c.decile, c.tokens_cum),\n"
        "hl_lg AS MATERIALIZED (\n"
        "  SELECT decile, tokens_cum, vocab_cum,\n"
        "    CAST(round(ln(CAST(tokens_cum AS DOUBLE)) * 1000000)"
        " AS BIGINT) AS xl,\n"
        "    CAST(round(ln(CAST(vocab_cum AS DOUBLE)) * 1000000)"
        " AS BIGINT) AS yl\n"
        "  FROM hl_v),\n"
        "hl_b AS MATERIALIZED (\n"
        "  SELECT CAST(count(*) AS BIGINT) AS k,\n"
        "    CAST(SUM(xl) AS BIGINT) AS sx, CAST(SUM(yl) AS BIGINT) AS sy,\n"
        "    CAST(SUM(xl * yl) AS BIGINT) AS sxy,\n"
        "    CAST(SUM(xl * xl) AS BIGINT) AS sxx\n"
        "  FROM hl_lg)\n"
        "SELECT l.decile, l.tokens_cum, l.vocab_cum,\n"
        "  CASE WHEN b.k * b.sxx - b.sx * b.sx <> 0 THEN\n"
        "    round(CAST(b.k * b.sxy - b.sx * b.sy AS DOUBLE)\n"
        "      / CAST(b.k * b.sxx - b.sx * b.sx AS DOUBLE), 6)\n"
        "  END AS heaps_beta\n"
        "FROM hl_lg l, hl_b b"
    )


def _bpe_merge_step(step: int) -> list[str]:
    """CTEs for ONE BPE merge step: weighted adjacent-pair counts from
    ``s{step-1}``, the argmax rule ``best{step}``, then leftmost-greedy
    non-overlapping application as run-parity selection (gaps-and-islands
    over the match positions; within each run of consecutive matches the
    even offsets are the greedily-executed merges)."""
    p = f"s{step - 1}"
    return [
        f"pc{step} AS MATERIALIZED (SELECT a, b, sum(f) AS cnt FROM (\n"
        f"  SELECT w, f, seg[i] AS a, seg[i+1] AS b\n"
        f"  FROM {p}, unnest(range(1, len(seg))) AS t(i)) GROUP BY a, b)",
        f"best{step} AS MATERIALIZED (SELECT a, b, a || b AS m,\n"
        f"  CAST(cnt AS BIGINT) AS cnt\n"
        f"  FROM pc{step} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)",
        f"x{step} AS MATERIALIZED (SELECT w, f, i, s,\n"
        f"  (s = (SELECT a FROM best{step}) AND\n"
        f"   lead(s) OVER (PARTITION BY w ORDER BY i)"
        f" = (SELECT b FROM best{step})) AS mt\n"
        f"  FROM (SELECT w, f, unnest(seg) AS s,\n"
        f"        generate_subscripts(seg, 1) AS i FROM {p}))",
        f"g{step} AS MATERIALIZED (SELECT w, f, i, s, mt,\n"
        f"  CASE WHEN mt THEN i -"
        f" row_number() OVER (PARTITION BY w, mt ORDER BY i) END AS grp\n"
        f"  FROM x{step})",
        f"r{step} AS MATERIALIZED (SELECT w, f, i, s,\n"
        f"  coalesce(mt AND (i - min(i) OVER (PARTITION BY w, grp)) % 2 = 0,\n"
        f"           FALSE) AS sel\n"
        f"  FROM g{step})",
        f"d{step} AS MATERIALIZED (SELECT w, f, i, s, sel,\n"
        f"  coalesce(lag(sel) OVER (PARTITION BY w ORDER BY i), FALSE)"
        f" AS drop_me\n"
        f"  FROM r{step})",
        f"s{step} AS MATERIALIZED (SELECT w, f,\n"
        f"  list(CASE WHEN sel THEN (SELECT m FROM best{step}) ELSE s END"
        f" ORDER BY i) AS seg\n"
        f"  FROM d{step} WHERE NOT drop_me GROUP BY w, f)",
    ]


def bpe_merges_sql(n_merges: int = 8) -> str:
    """Mirror of operators.bpe.bpe_merges: the distinct-word frequency
    table, char-initial segmentation, and ``n_merges`` unrolled
    count-argmax-apply steps.  The Spark side applies each merge as a
    codegen'd leftmost-greedy fold; this side as window-function
    run-parity — same semantics, both validated against a plain-Python
    reference in tests/test_bpe.py."""
    parts = [
        TOKS_CTE,
        "wf AS MATERIALIZED (SELECT term AS w, CAST(count(*) AS BIGINT) AS f\n"
        "  FROM (SELECT unnest(toks) AS term FROM toks_t) GROUP BY term)",
        "s0 AS MATERIALIZED (SELECT w, f,\n"
        "  list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS seg\n"
        "  FROM wf)",
    ]
    for step in range(1, n_merges + 1):
        parts.extend(_bpe_merge_step(step))
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({s} AS BIGINT) AS step, a AS left_sym,"
        f" b AS right_sym, m AS merged, cnt FROM best{s}"
        for s in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


def bpe_tokenize_sql(n_merges: int = 8) -> str:
    """Mirror of operators.bpe.bpe_tokenize: the identical unrolled
    training chain as bpe_merges_sql, then every document's word
    sequence joined to the final segmentation and exploded in order."""
    parts = [
        TOKS_CTE,
        "wf AS MATERIALIZED (SELECT term AS w, CAST(count(*) AS BIGINT) AS f\n"
        "  FROM (SELECT unnest(toks) AS term FROM toks_t) GROUP BY term)",
        "s0 AS MATERIALIZED (SELECT w, f,\n"
        "  list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS seg\n"
        "  FROM wf)",
    ]
    for step in range(1, n_merges + 1):
        parts.extend(_bpe_merge_step(step))
    parts.append(
        "dw AS MATERIALIZED (SELECT doc_id,\n"
        "  unnest(range(1, len(toks) + 1)) AS i, toks FROM toks_t)"
    )
    parts.append(
        "dwp AS MATERIALIZED (SELECT doc_id,"
        " CAST(i - 1 AS BIGINT) AS word_pos, toks[i] AS w FROM dw)"
    )
    parts.append(
        f"pieces AS MATERIALIZED (SELECT d.doc_id, d.word_pos,\n"
        f"  unnest(range(1, len(sw.seg) + 1)) AS j, sw.seg\n"
        f"  FROM dwp d JOIN s{n_merges} sw ON sw.w = d.w)"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT doc_id, word_pos, CAST(j - 1 AS BIGINT) AS piece_idx,\n"
        "  seg[j] AS piece FROM pieces"
    )


def bpe_fertility_sql(n_merges: int = 8) -> str:
    """Mirror of operators.bpe.bpe_fertility: the identical unrolled
    training chain, then per-word (size(seg), length(w)) grouped by the
    document's source with the exact micro-divisions (// floors; all
    counts nonnegative, matching Spark's remainder-subtract div)."""
    parts = [
        TOKS_CTE,
        "wf AS MATERIALIZED (SELECT term AS w, CAST(count(*) AS BIGINT) AS f\n"
        "  FROM (SELECT unnest(toks) AS term FROM toks_t) GROUP BY term)",
        "s0 AS MATERIALIZED (SELECT w, f,\n"
        "  list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS seg\n"
        "  FROM wf)",
    ]
    for step in range(1, n_merges + 1):
        parts.extend(_bpe_merge_step(step))
    parts.append(
        "dw2 AS MATERIALIZED (SELECT t.doc_id, d.source, unnest(t.toks) AS w\n"
        "  FROM toks_t t JOIN documents d ON d.doc_id = t.doc_id)"
    )
    parts.append(
        f"per AS MATERIALIZED (SELECT d.source,\n"
        f"  CAST(len(sw.seg) AS BIGINT) AS np,\n"
        f"  CAST(length(d.w) AS BIGINT) AS nc\n"
        f"  FROM dw2 d JOIN s{n_merges} sw ON sw.w = d.w)"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT source, CAST(count(*) AS BIGINT) AS n_words,\n"
        "  CAST(sum(np) AS BIGINT) AS n_pieces,\n"
        "  CAST(sum(nc) AS BIGINT) AS n_chars,\n"
        "  CAST((1000000 * sum(np)) // count(*) AS BIGINT)\n"
        "    AS fertility_micros,\n"
        "  CAST((1000000 * sum(nc)) // sum(np) AS BIGINT)\n"
        "    AS chars_per_piece_micros\n"
        "FROM per GROUP BY source"
    )


def weighted_sample_sql(n: int = 100, salt: str = "wsample") -> str:
    """Mirror of operators.packing.weighted_sample over documents with
    n_chars as the weight: identical hash-uniform, identical micro-unit
    log-priority rounding, identical (priority DESC, doc_id ASC) top-n."""
    h = _h48(f"'{salt}' || ':' || CAST(doc_id AS VARCHAR)")
    return (
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,\n"
        f"  CAST(round(ln(({h} + 1) * 1.0 / {1 << 48}) * 1.0 / n_chars"
        " * 1000000, 0) AS BIGINT) AS priority_micros\n"
        "FROM documents WHERE n_chars > 0\n"
        f"ORDER BY priority_micros DESC, doc_id ASC LIMIT {n}"
    )


def mix_corpus_sql(
    weights: dict[str, int],
    total: int,
    salt: str = "mix",
) -> str:
    """Mirror of operators.packing.mix_corpus over documents: the same
    ``mixture_targets`` Python computes the per-source targets for both
    engines (no drift possible), and the per-stratum hash ranks are the
    shared 48-bit md5."""
    from graphlite_spark.operators.packing import mixture_targets

    targets = mixture_targets(weights, total)
    whens = "\n".join(
        f"    WHEN '{s}' THEN {t}" for s, t in targets.items()
    )
    h = _h48(f"'{salt}' || ':' || CAST(doc_id AS VARCHAR)")
    return (
        "WITH r AS (SELECT doc_id, source,\n"
        f"  CASE source\n{whens}\n    ELSE 0 END AS target,\n"
        f"  CAST(row_number() OVER (PARTITION BY source\n"
        f"    ORDER BY {h}, doc_id) AS BIGINT) AS mix_rank\n"
        "  FROM documents)\n"
        "SELECT doc_id, source, mix_rank FROM r WHERE mix_rank <= target"
    )


def token_count_sql() -> str:
    # n_bpe_tokens: BPE-ish pre-tokenization — alnum runs or single
    # non-alnum marks (same RE2/Java-regex-safe pattern on both engines)
    return (
        f"WITH {TOKS_CTE}\n"
        "SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,\n"
        "       CAST(len(list_distinct(t.toks)) AS BIGINT) AS n_distinct,\n"
        "       CAST(len(regexp_extract_all(lower(d.text),\n"
        "            '[a-z0-9]+|[^a-z0-9 \\t\\n]')) AS BIGINT) AS n_bpe_tokens\n"
        "FROM toks_t t JOIN documents d ON d.doc_id = t.doc_id"
    )


def _kmeans_ctes(
    k: int,
    iterations: int,
    d: int,
    sfx: str = "",
    pos_lo: int = 0,
) -> list[str]:
    """CTE chain ending in ``cent{iterations}{sfx}`` (cl, pos, cv): the
    quantized vertical form ``qe{sfx}``, hash-min seeds, and the unrolled
    Lloyd iterations — shared by kmeans_sql, ivf_topk_sql and pq_sql.
    ``sfx``/``pos_lo`` carve one PQ subspace: positions
    [pos_lo, pos_lo + d) of the full vector, CTE names suffixed so m
    independent chains coexist in one query (seed ids identical across
    subspaces, exactly like operators.kmeans.pq_encode)."""
    h = _h48("'kmeans:' || CAST(vec_id AS VARCHAR)")
    parts = [
        f"qe{sfx} AS MATERIALIZED (\n"
        f"  SELECT vec_id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000, 0)"
        " AS BIGINT) AS qv\n"
        f"  FROM embeddings, range({pos_lo + 1}, {pos_lo + d + 1}) t(i))",
        f"sd{sfx} AS MATERIALIZED (\n"
        "  SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1 AS cl\n"
        f"  FROM (SELECT vec_id, {h} AS h FROM embeddings)\n"
        f"  ORDER BY h, vec_id LIMIT {k})",
        f"cent0{sfx} AS MATERIALIZED (\n"
        "  SELECT s.cl, q.pos, q.qv AS cv\n"
        f"  FROM sd{sfx} s JOIN qe{sfx} q ON q.vec_id = s.vec_id)",
    ]
    for r in range(1, iterations + 1):
        prev = f"cent{r - 1}{sfx}"
        parts.append(
            f"asg{r}{sfx} AS MATERIALIZED (\n"
            f"  SELECT vec_id, cl FROM (\n"
            f"    SELECT q.vec_id, c.cl,\n"
            f"      row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
            f"        sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
            f"    FROM qe{sfx} q JOIN {prev} c ON c.pos = q.pos\n"
            f"    GROUP BY q.vec_id, c.cl) WHERE rn = 1)"
        )
        parts.append(
            f"sums{r}{sfx} AS MATERIALIZED (\n"
            f"  SELECT a.cl, q.pos, sum(q.qv) AS s, count(*) AS n\n"
            f"  FROM asg{r}{sfx} a JOIN qe{sfx} q ON q.vec_id = a.vec_id\n"
            f"  GROUP BY a.cl, q.pos)"
        )
        parts.append(
            f"cent{r}{sfx} AS MATERIALIZED (\n"
            f"  SELECT p.cl, p.pos,\n"
            f"    CAST(COALESCE(s.s // s.n, p.cv) AS BIGINT) AS cv\n"
            f"  FROM {prev} p LEFT JOIN sums{r}{sfx} s\n"
            f"    ON s.cl = p.cl AND s.pos = p.pos)"
        )
    return parts


def pq_sql(
    m: int = 4, k: int = 8, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.pq_encode: m independent subspace
    codebooks (identical quantization, seeding, tie-breaks and
    truncating centroid division as kmeans_sql), each vector emitting
    one (sub, code, dist_sq) row per subspace."""
    if d % m:
        raise ValueError(f"pq_sql: d={d} not divisible by m={m}")
    sub = d // m
    parts: list[str] = []
    finals = []
    for s in range(m):
        parts.extend(
            _kmeans_ctes(k, iterations, sub, sfx=f"_{s}", pos_lo=s * sub)
        )
        finals.append(
            f"SELECT vec_id, CAST({s} AS BIGINT) AS sub,\n"
            f"  CAST(cl AS BIGINT) AS code, CAST(d2 AS BIGINT) AS dist_sq\n"
            f"FROM (\n"
            f"  SELECT q.vec_id, c.cl,\n"
            f"    sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2,\n"
            f"    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
            f"      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
            f"  FROM qe_{s} q JOIN cent{iterations}_{s} c ON c.pos = q.pos\n"
            f"  GROUP BY q.vec_id, c.cl) WHERE rn = 1"
        )
    joined = ",\n".join(parts)
    union = "\nUNION ALL\n".join(finals)
    return f"WITH {joined}\n{union}"


def pq_distortion_sql(
    m: int = 4, k: int = 8, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.pq_distortion: the full pq_sql body
    nested as a CTE (a CTE body may open its own WITH), aggregated to
    per-subspace totals with a truncating mean division (all
    nonnegative, so ``//`` == Spark ``div``)."""
    return (
        f"WITH pqd AS MATERIALIZED (\n{pq_sql(m, k, iterations, d)}\n)\n"
        "SELECT sub, CAST(count(*) AS BIGINT) AS n_vectors,\n"
        "  CAST(SUM(dist_sq) AS BIGINT) AS total_err,\n"
        "  CAST(CAST(SUM(dist_sq) AS BIGINT) // count(*) AS BIGINT)"
        " AS mean_err\n"
        "FROM pqd GROUP BY sub"
    )


def kcenter_select_sql(k: int = 8, d: int = 64) -> str:
    """Mirror of operators.kmeans.kcenter_select: unrolled greedy
    farthest-first rounds — identical micro-unit quantization, hash-min
    seed, BIGINT distances, (dist DESC, id ASC) argmax tie-break."""
    h = _h48("'kcenter:' || CAST(vec_id AS VARCHAR)")
    parts = [
        "qe AS MATERIALIZED (\n"
        "  SELECT vec_id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000, 0)"
        " AS BIGINT) AS qv\n"
        f"  FROM embeddings, range(1, {d + 1}) t(i))",
        "s0 AS MATERIALIZED (\n"
        f"  SELECT vec_id FROM (SELECT vec_id, {h} AS h"
        " FROM embeddings)\n"
        "  ORDER BY h, vec_id LIMIT 1)",
        "d1 AS MATERIALIZED (\n"
        "  SELECT q.vec_id,"
        " CAST(sum((q.qv - c.qv) * (q.qv - c.qv)) AS BIGINT) AS md\n"
        "  FROM qe q JOIN qe c ON c.pos = q.pos\n"
        "  JOIN s0 ON c.vec_id = s0.vec_id\n"
        "  GROUP BY q.vec_id)",
        "s1 AS MATERIALIZED (SELECT vec_id, md FROM d1\n"
        "  ORDER BY md DESC, vec_id LIMIT 1)",
    ]
    for r in range(2, k):
        parts.extend([
            f"d{r} AS MATERIALIZED (\n"
            f"  SELECT p.vec_id, LEAST(p.md, n.nd) AS md\n"
            f"  FROM d{r - 1} p JOIN (\n"
            "    SELECT q.vec_id,"
            " CAST(sum((q.qv - c.qv) * (q.qv - c.qv)) AS BIGINT) AS nd\n"
            "    FROM qe q JOIN qe c ON c.pos = q.pos\n"
            f"    JOIN s{r - 1} s ON c.vec_id = s.vec_id\n"
            "    GROUP BY q.vec_id) n USING (vec_id))",
            f"s{r} AS MATERIALIZED (SELECT vec_id, md FROM d{r}\n"
            "  ORDER BY md DESC, vec_id LIMIT 1)",
        ])
    sel = [
        "SELECT CAST(0 AS BIGINT) AS center_rank, vec_id,"
        " CAST(0 AS BIGINT) AS radius_sq FROM s0"
    ] + [
        f"SELECT CAST({r} AS BIGINT), vec_id, md FROM s{r}"
        for r in range(1, k)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def kmeans_sql(k: int = 8, iterations: int = 3, d: int = 64) -> str:
    """Mirror of operators.kmeans.kmeans_embeddings: identical micro-unit
    quantization, hash-min seeding, BIGINT distances with
    smallest-cluster tie-break, truncating-division centroid updates
    (DuckDB ``//`` and Spark ``div`` both truncate toward zero), empty
    clusters keep their previous centroid.  ``d`` pins the embedding
    dimensionality (the query targets the 64-dim embeddings table)."""
    joined = ",\n".join(_kmeans_ctes(k, iterations, d))
    return (
        f"WITH {joined}\n"
        "SELECT vec_id, CAST(cl AS BIGINT) AS cluster,\n"
        "  CAST(d2 AS BIGINT) AS dist_sq FROM (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN cent{iterations} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl) WHERE rn = 1"
    )


def semdedup_sql(
    k: int = 8, iterations: int = 3, tau: float = 0.3, d: int = 64
) -> str:
    """Mirror of operators.dedup.semdedup: the kmeans_sql assignment as a
    CTE, then within-cluster dominance — drop x when a clustermate y with
    (dist_sq, id) rank below x has round(cos(x,y),6) >= tau."""
    joined = ",\n".join(_kmeans_ctes(k, iterations, d))
    return (
        f"WITH {joined},\n"
        "asgF AS MATERIALIZED (\n"
        "  SELECT vec_id, CAST(cl AS BIGINT) AS cluster,\n"
        "    CAST(d2 AS BIGINT) AS dist_sq FROM (\n"
        "    SELECT q.vec_id, c.cl,\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2,\n"
        "      row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "        sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"    FROM qe q JOIN cent{iterations} c ON c.pos = q.pos\n"
        "    GROUP BY q.vec_id, c.cl) WHERE rn = 1),\n"
        "ev AS MATERIALIZED (SELECT vec_id,\n"
        "  list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v\n"
        "  FROM embeddings),\n"
        "dom AS MATERIALIZED (\n"
        "  SELECT DISTINCT x.vec_id FROM asgF x\n"
        "  JOIN asgF y ON y.cluster = x.cluster AND (\n"
        "    y.dist_sq < x.dist_sq OR\n"
        "    (y.dist_sq = x.dist_sq AND y.vec_id < x.vec_id))\n"
        "  JOIN ev q ON q.vec_id = x.vec_id\n"
        "  JOIN ev c ON c.vec_id = y.vec_id\n"
        f"  WHERE {_COS} >= {tau})\n"
        "SELECT a.vec_id, a.cluster, a.dist_sq,\n"
        "  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)\n"
        "    AS keep\n"
        "FROM asgF a LEFT JOIN dom d ON d.vec_id = a.vec_id"
    )


def ivf_topk_sql(
    k: int = 3,
    nprobe: int = 2,
    n_clusters: int = 8,
    iterations: int = 2,
    num_queries: int = 20,
    d: int = 64,
    label_filter: bool = False,
) -> str:
    """Mirror of operators.similarity.ivf_topk: the k-means CTE chain
    re-derives the identical codebook, corpus vectors take their argmin
    cell, queries probe their ``nprobe`` nearest cells (BIGINT distances,
    smaller-cell tie-break), and cosine top-k runs only within probed
    cells.  ``label_filter`` mirrors the hard-negative-mining variant:
    only different-label candidates compete, labels in the output."""
    cents = f"cent{iterations}"
    parts = _kmeans_ctes(n_clusters, iterations, d)
    parts.append(
        "celld AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN {cents} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl)"
    )
    parts.append(
        "corp AS MATERIALIZED (SELECT vec_id, cl AS cell FROM celld WHERE rn = 1)"
    )
    parts.append(
        "probe AS MATERIALIZED (SELECT vec_id, cl AS cell FROM celld\n"
        f"  WHERE vec_id < {num_queries} AND rn <= {nprobe})"
    )
    parts.append(_EMB_D)
    lab_sel = (
        "    lq.label AS query_label, lc.label AS neighbor_label,\n"
        if label_filter
        else ""
    )
    lab_join = (
        "  JOIN embeddings lq ON lq.vec_id = p.vec_id\n"
        "  JOIN embeddings lc ON lc.vec_id = co.vec_id"
        " AND lq.label <> lc.label\n"
        if label_filter
        else ""
    )
    parts.append(
        "scored AS MATERIALIZED (\n"
        f"  SELECT p.vec_id AS query_id, co.vec_id AS neighbor_id,\n"
        f"{lab_sel}"
        f"    {_COS} AS sim\n"
        "  FROM probe p JOIN corp co ON co.cell = p.cell"
        " AND co.vec_id <> p.vec_id\n"
        f"{lab_join}"
        "  JOIN e q ON q.vec_id = p.vec_id\n"
        "  JOIN e c ON c.vec_id = co.vec_id)"
    )
    joined = ",\n".join(parts)
    out_cols = (
        "query_id, query_label, neighbor_id, neighbor_label, rank, sim"
        if label_filter
        else "query_id, neighbor_id, rank, sim"
    )
    return (
        f"WITH {joined}\n"
        f"SELECT {out_cols} FROM (\n"
        "  SELECT *, CAST(row_number() OVER (PARTITION BY query_id\n"
        "    ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank FROM scored)\n"
        f"WHERE rank <= {k}"
    )


def ivfpq_topk_sql(
    k: int = 3,
    nprobe: int = 2,
    n_clusters: int = 8,
    m: int = 4,
    pq_k: int = 8,
    iterations: int = 2,
    num_queries: int = 20,
    d: int = 64,
) -> str:
    """Mirror of operators.similarity.ivfpq_topk: the coarse k-means
    chain routes probes, the m subspace chains (identical to pq_sql)
    give every corpus vector its codes, and the asymmetric distance is
    the query's exact subvector against each candidate's codeword —
    BIGINT micro-units throughout, (adc ASC, neighbor_id ASC) top-k."""
    if d % m:
        raise ValueError(f"ivfpq_topk_sql: d={d} not divisible by m={m}")
    sub = d // m
    cents = f"cent{iterations}"
    parts = _kmeans_ctes(n_clusters, iterations, d)
    parts.append(
        "celld AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN {cents} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl)"
    )
    parts.append(
        "corp AS MATERIALIZED (SELECT vec_id, cl AS cell FROM celld"
        " WHERE rn = 1)"
    )
    parts.append(
        "probe AS MATERIALIZED (SELECT vec_id, cl AS cell FROM celld\n"
        f"  WHERE vec_id < {num_queries} AND rn <= {nprobe})"
    )
    adc_terms, joins = [], []
    for sp in range(m):
        parts.extend(
            _kmeans_ctes(pq_k, iterations, sub, sfx=f"_{sp}", pos_lo=sp * sub)
        )
        parts.append(
            f"codes_{sp} AS MATERIALIZED (SELECT vec_id, cl AS code FROM (\n"
            f"  SELECT q.vec_id, c.cl,\n"
            f"    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
            f"      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
            f"  FROM qe_{sp} q JOIN cent{iterations}_{sp} c ON c.pos = q.pos\n"
            f"  GROUP BY q.vec_id, c.cl) WHERE rn = 1)"
        )
        parts.append(
            f"qd_{sp} AS MATERIALIZED (\n"
            f"  SELECT q.vec_id, c.cl,\n"
            f"    sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2\n"
            f"  FROM qe_{sp} q JOIN cent{iterations}_{sp} c ON c.pos = q.pos\n"
            f"  WHERE q.vec_id < {num_queries}\n"
            f"  GROUP BY q.vec_id, c.cl)"
        )
        joins.append(
            f"  JOIN codes_{sp} cs{sp} ON cs{sp}.vec_id = co.vec_id\n"
            f"  JOIN qd_{sp} qs{sp} ON qs{sp}.vec_id = p.vec_id"
            f" AND qs{sp}.cl = cs{sp}.code\n"
        )
        adc_terms.append(f"qs{sp}.d2")
    parts.append(
        "scored AS MATERIALIZED (\n"
        "  SELECT p.vec_id AS query_id, co.vec_id AS neighbor_id,\n"
        f"    CAST({' + '.join(adc_terms)} AS BIGINT) AS adc\n"
        "  FROM probe p JOIN corp co ON co.cell = p.cell"
        " AND co.vec_id <> p.vec_id\n"
        + "".join(joins)
        + ")"
    )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        "SELECT query_id, neighbor_id, rank, adc FROM (\n"
        "  SELECT *, CAST(row_number() OVER (PARTITION BY query_id\n"
        "    ORDER BY adc ASC, neighbor_id ASC) AS INT) AS rank"
        " FROM scored)\n"
        f"WHERE rank <= {k}"
    )


def ivf_recall_sql(
    k: int = 5,
    nprobe: int = 2,
    n_clusters: int = 8,
    iterations: int = 2,
    num_queries: int = 20,
    d: int = 64,
) -> str:
    """Mirror of operators.similarity.ivf_recall: brute-force top-k and
    IVF top-k as CTEs, intersected per query (integer hit counts are
    hash-exact; recall is one rounded division)."""
    cents = f"cent{iterations}"
    parts = _kmeans_ctes(n_clusters, iterations, d)
    parts.append(
        "celld AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN {cents} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl)"
    )
    parts.append(
        "corp AS MATERIALIZED (SELECT vec_id, cl AS cell FROM celld WHERE rn = 1)"
    )
    parts.append(
        "probe AS MATERIALIZED (SELECT vec_id, cl AS cell FROM celld\n"
        f"  WHERE vec_id < {num_queries} AND rn <= {nprobe})"
    )
    parts.append(_EMB_D)
    parts.append(
        "truth AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        f"    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        f"        ORDER BY {_COS} DESC, c.vec_id ASC) AS rank\n"
        f"    FROM e q JOIN e c ON c.vec_id <> q.vec_id\n"
        f"    WHERE q.vec_id < {num_queries})\n"
        f"  WHERE rank <= {k})"
    )
    parts.append(
        "approx AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        f"    SELECT p.vec_id AS query_id, co.vec_id AS neighbor_id,\n"
        "      row_number() OVER (PARTITION BY p.vec_id\n"
        f"        ORDER BY {_COS} DESC, co.vec_id ASC) AS rank\n"
        "    FROM probe p JOIN corp co ON co.cell = p.cell"
        " AND co.vec_id <> p.vec_id\n"
        "    JOIN e q ON q.vec_id = p.vec_id\n"
        "    JOIN e c ON c.vec_id = co.vec_id)\n"
        f"  WHERE rank <= {k})"
    )
    parts.append(
        "nt AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY query_id)"
    )
    parts.append(
        "na AS (SELECT query_id, count(*) AS n_approx FROM approx GROUP BY query_id)"
    )
    parts.append(
        "h AS (SELECT t.query_id, count(*) AS n_hits\n"
        "  FROM truth t JOIN approx a\n"
        "    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id\n"
        "  GROUP BY t.query_id)"
    )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        "SELECT nt.query_id, CAST(nt.n_truth AS BIGINT) AS n_truth,\n"
        "  CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,\n"
        "  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,\n"
        "  round(COALESCE(h.n_hits, 0) / nt.n_truth, 6) AS recall\n"
        "FROM nt LEFT JOIN na ON na.query_id = nt.query_id\n"
        "LEFT JOIN h ON h.query_id = nt.query_id"
    )


def embedding_near_dups_sql(
    threshold: float = 0.95, prefilter_bits: int | None = None
) -> str:
    """Mirror of operators.dedup.embedding_near_dups.  With
    ``prefilter_bits`` the pair space is the sign-bit LSH bucket equi-join
    (the checked scale path); without, the brute-force a<b join."""
    if prefilter_bits:
        bucket = " + ".join(
            f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(prefilter_bits)
        )
        return (
            "WITH e AS MATERIALIZED (SELECT vec_id,\n"
            "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,\n"
            f"  CAST({bucket} AS BIGINT) AS bucket FROM embeddings)\n"
            "SELECT a, b, sim FROM (\n"
            "  SELECT q.vec_id AS a, c.vec_id AS b,\n"
            f"         {_COS} AS sim\n"
            "  FROM e q JOIN e c ON c.bucket = q.bucket AND q.vec_id < c.vec_id)\n"
            f"WHERE sim >= {threshold}"
        )
    return (
        f"WITH {_EMB_D}\n"
        "SELECT a, b, sim FROM (\n"
        "  SELECT q.vec_id AS a, c.vec_id AS b,\n"
        f"         {_COS} AS sim\n"
        "  FROM e q JOIN e c ON q.vec_id < c.vec_id)\n"
        f"WHERE sim >= {threshold}"
    )


_STOP_RATIO = (
    f"CAST(len(list_filter(toks, t -> list_contains({_STOPLIST}, t))) AS DOUBLE)"
    " / greatest(len(toks), 1)"
)


def repetition_sql(n: int = 2) -> str:
    """Mirror of functions.text.repetition_exprs: n-gram instance repeats
    and top-token frequency share, exact micro-units (both engines
    truncate the nonnegative division)."""
    gram = " || chr(31) || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"WITH {TOKS_CTE},\n"
        "g AS MATERIALIZED (SELECT doc_id, toks,\n"
        f"  CASE WHEN len(toks) >= {n} THEN\n"
        f"    list_transform(range(1, len(toks) - {n} + 2), i -> {gram})\n"
        "  ELSE CAST([] AS VARCHAR[]) END AS grams\n"
        "  FROM toks_t)\n"
        "SELECT doc_id,\n"
        "  CAST(len(toks) AS BIGINT) AS n_tokens,\n"
        "  CAST(len(grams) AS BIGINT) AS n_grams,\n"
        "  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS n_dup_grams,\n"
        "  CAST(CASE WHEN len(grams) = 0 THEN 0 ELSE\n"
        "    (1000000 * (len(grams) - len(list_distinct(grams)))) // len(grams)\n"
        "  END AS BIGINT) AS dup_gram_micros,\n"
        "  CAST(CASE WHEN len(toks) = 0 THEN 0 ELSE\n"
        "    (1000000 * COALESCE(list_max(list_transform(list_distinct(toks),\n"
        "      u -> len(list_filter(toks, x -> x = u)))), 0)) // len(toks)\n"
        "  END AS BIGINT) AS top_token_micros\n"
        "FROM g"
    )


def lang_id_confusion_sql() -> str:
    """Mirror of the lang-ID confusion-matrix query: predicted label vs
    the generator's ground-truth ``lang`` column."""
    return (
        "WITH t AS MATERIALIZED (SELECT lang,\n"
        "  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
        " AS toks FROM documents)\n"
        f"SELECT lang, CASE WHEN {_STOP_RATIO} >= {LANG_EN_THRESHOLD}\n"
        "    THEN 'en' ELSE 'und' END AS lang_pred,\n"
        "  CAST(count(*) AS BIGINT) AS n_docs\n"
        "FROM t GROUP BY 1, 2"
    )


def lang_id_sql() -> str:
    return (
        f"WITH {TOKS_CTE}\n"
        f"SELECT doc_id, CASE WHEN {_STOP_RATIO} >= {LANG_EN_THRESHOLD}\n"
        "       THEN 'en' ELSE 'und' END AS lang_pred\n"
        "FROM toks_t"
    )


def code_switch_sql(window: int = 16) -> str:
    """Mirror of operators.tfidf.code_switch_score: per-window lang-id
    over non-overlapping token chunks vs the doc-level lang-id, one
    integer division."""
    w = window
    win = f"toks[CAST((i - 1) * {w} + 1 AS INT):CAST((i - 1) * {w} + {w} AS INT)]"
    win_ratio = (
        f"CAST(len(list_filter({win}, t -> list_contains({_STOPLIST}, t)))"
        f" AS DOUBLE) / greatest(len({win}), 1)"
    )
    return f"""
WITH {TOKS_CTE},
base AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN {_STOP_RATIO} >= {LANG_EN_THRESHOLD}
         THEN 'en' ELSE 'und' END AS doc_lang,
    CASE WHEN len(toks) >= 1 THEN
      list_transform(range(1, CAST(ceil(len(toks) / {w}.0) AS BIGINT) + 1),
        i -> CASE WHEN {win_ratio} >= {LANG_EN_THRESHOLD}
                  THEN 'en' ELSE 'und' END)
      ELSE [] END AS wl
  FROM toks_t)
SELECT doc_id, doc_lang,
  CAST(len(wl) AS BIGINT) AS n_windows,
  CAST(len(list_filter(wl, l -> l <> doc_lang)) AS BIGINT) AS n_divergent,
  CAST(CASE WHEN len(wl) = 0 THEN 0
       ELSE (1000000 * len(list_filter(wl, l -> l <> doc_lang))) // len(wl)
       END AS BIGINT) AS divergence_micros
FROM base
"""


def quality_sql() -> str:
    mean_len = (
        "CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)"
        " / greatest(len(toks), 1)"
    )
    return (
        f"WITH {TOKS_CTE}\n"
        "SELECT doc_id,\n"
        "  CAST(len(toks) AS BIGINT) AS n_tokens,\n"
        f"  round({_STOP_RATIO}, 6) AS stop_ratio,\n"
        f"  round({mean_len}, 6) AS mean_token_len,\n"
        f"  round(0.2 + 1.5 * ({_STOP_RATIO}) + 0.02 * ({mean_len})\n"
        "        + 0.1 * ln(1 + len(toks)), 6) AS quality\n"
        "FROM toks_t"
    )


def curriculum_order_sql() -> str:
    """Mirror of operators.packing.curriculum_order: global rank by
    (quality DESC, doc_id) over the identical 6dp quality score."""
    return (
        f"WITH q AS MATERIALIZED ({quality_sql()})\n"
        "SELECT doc_id, n_tokens, quality,\n"
        "  CAST(row_number() OVER (ORDER BY quality DESC, doc_id) - 1"
        " AS BIGINT) AS order_idx\n"
        "FROM q"
    )


def quality_calibrated_sql() -> str:
    """Mirror of operators.packing.quality_calibrated: per-lang
    percentile position of the 6dp quality score, one integer div
    (ranks non-negative, // == Spark div)."""
    return (
        f"WITH q AS MATERIALIZED ({quality_sql()})\n"
        "SELECT q.doc_id, d.lang, q.quality,\n"
        "  CAST(((row_number() OVER (PARTITION BY d.lang\n"
        "           ORDER BY q.quality, q.doc_id) - 1) * 1000000)\n"
        "       // greatest(count(*) OVER (PARTITION BY d.lang) - 1, 1)\n"
        "       AS BIGINT) AS pct_micros\n"
        "FROM q JOIN documents d USING (doc_id)"
    )


def fingerprint_sql() -> str:
    return (
        f"WITH {TOKS_CTE}\n"
        "SELECT doc_id,\n"
        "  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint\n"
        "FROM toks_t"
    )


def rolling_fingerprint_sql(base: int = 31, mod: int = 2147483647) -> str:
    return (
        "SELECT doc_id, list_reduce(\n"
        "  list_prepend(CAST(0 AS BIGINT),\n"
        "    list_transform(regexp_extract_all(text, '[^\\n]', 0),\n"
        "                   c -> CAST(ascii(c) AS BIGINT))),\n"
        f"  (a, x) -> (a * {base} + x) % {mod}) AS rhash\n"
        "FROM documents"
    )


def multimodal_decode_ppm_sql() -> str:
    """Closed form of the synthetic-PPM round trip: the encoder derives
    (width, height) from md5(text) bytes 0/1; the REAL decoder must read
    exactly those back out of the P6 header."""
    w = "4 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 29"
    h = "4 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 23"
    return (
        "SELECT doc_id,\n"
        f"  CAST({w} AS INTEGER) AS width,\n"
        f"  CAST({h} AS INTEGER) AS height,\n"
        f"  CAST(({w}) * ({h}) AS BIGINT) AS n_pixels\n"
        "FROM documents"
    )


def multimodal_decode_png_sql() -> str:
    """Closed form of the synthetic-PNG round trip.  The encoder derives
    dims from md5(text) and pixels from unhex(md5(md5(text))) repeated;
    the REAL decoder must inflate + un-filter back to exactly those bytes,
    verified by md5 over the pixel buffer's (lowercase) hex form — DuckDB's
    md5 takes VARCHAR only, so the digest chain stays in hex strings on
    both sides."""
    return (
        "WITH p AS (SELECT doc_id,\n"
        "  4 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 29 AS w,\n"
        "  4 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 23 AS h,\n"
        "  md5(md5(text)) AS seed\n"
        "  FROM documents)\n"
        "SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,\n"
        "  CAST(w * h AS BIGINT) AS n_pixels,\n"
        "  md5(substring(repeat(seed, (w * h * 3) // 16 + 1), 1, w * h * 3 * 2))\n"
        "    AS pixel_digest\n"
        "FROM p"
    )


def multimodal_decode_jpeg_sql() -> str:
    """Closed form of the baseline-JPEG round trip: the encoder draws a
    (1 + md5[0]%3) x (1 + md5[1]%3) grid of constant 8x8 blocks with
    values from md5(md5(text)) bytes cycled; the all-ones quantization
    table makes the lossy pipeline exact on this subset, so the DECODED
    grayscale bytes (hex) must hash to the encoder input's closed form —
    the Spark side earns this only by running real Huffman + dequant +
    IDCT."""
    return (
        "WITH p AS MATERIALIZED (SELECT doc_id,\n"
        "  1 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 3 AS bx,\n"
        "  1 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 3 AS by,\n"
        "  md5(md5(text)) AS seed\n"
        "  FROM documents),\n"
        "rows_ AS MATERIALIZED (\n"
        "  SELECT p.doc_id, p.bx, p.seed, r.rby\n"
        "  FROM p, (SELECT unnest(range(3)) AS rby) r WHERE r.rby < p.by),\n"
        "cells AS MATERIALIZED (\n"
        "  SELECT doc_id, rby, c.cbx,\n"
        "    substr(seed, 1 + 2 * ((rby * bx + c.cbx) % 16), 2) AS vhex\n"
        "  FROM rows_, (SELECT unnest(range(3)) AS cbx) c WHERE c.cbx < bx),\n"
        "rowhex AS MATERIALIZED (\n"
        "  SELECT doc_id, rby,\n"
        "    string_agg(repeat(vhex, 8), '' ORDER BY cbx) AS rh\n"
        "  FROM cells GROUP BY doc_id, rby),\n"
        "img AS MATERIALIZED (\n"
        "  SELECT doc_id, string_agg(repeat(rh, 8), '' ORDER BY rby) AS hx\n"
        "  FROM rowhex GROUP BY doc_id)\n"
        "SELECT p.doc_id, CAST(p.bx * 8 AS INTEGER) AS width,\n"
        "  CAST(p.by * 8 AS INTEGER) AS height,\n"
        "  CAST(p.bx * 8 * p.by * 8 AS BIGINT) AS n_pixels,\n"
        "  md5(img.hx) AS pixel_digest\n"
        "FROM p JOIN img ON img.doc_id = p.doc_id"
    )


def multimodal_frames_sql(every: int = 2) -> str:
    """Closed form of the raw-video frame sampling: the encoder writes
    1 + md5(text)[2] % 6 frames; the REAL parser walks them and keeps
    every Nth index."""
    f = "1 + CAST('0x' || substr(md5(text), 5, 2) AS INT) % 6"
    return (
        f"WITH v AS (SELECT doc_id, {f} AS f FROM documents)\n"
        f"SELECT doc_id, CAST(unnest(range(0, f, {every})) AS INTEGER) AS frame_idx\n"
        "FROM v"
    )


def multimodal_wav_sql() -> str:
    """Closed form of the WAV header round trip (encoder params from
    md5(text) bytes 3-5; decoder must read them back from the RIFF)."""
    sr = "8000 * (1 + CAST('0x' || substr(md5(text), 7, 2) AS INT) % 6)"
    ch = "1 + CAST('0x' || substr(md5(text), 9, 2) AS INT) % 2"
    n = "500 + CAST('0x' || substr(md5(text), 11, 2) AS INT) * 7"
    return (
        "SELECT doc_id,\n"
        f"  CAST({sr} AS INTEGER) AS sample_rate,\n"
        f"  CAST({ch} AS INTEGER) AS channels,\n"
        f"  CAST({n} AS BIGINT) AS n_samples,\n"
        # integer microseconds — exact in both engines (float round of
        # n/sr ties at 6dp differently: decimal-repr vs binary rounding)
        f"  CAST((CAST({n} AS BIGINT) * 1000000) // ({sr}) AS BIGINT) AS duration_us\n"
        "FROM documents"
    )


def multimodal_mp4_sql() -> str:
    """Closed form of the ISO BMFF round trip (encoder params from
    md5(text) bytes 6-10; decoder must read them back from the box
    tree)."""
    ts = "600 * (1 + CAST('0x' || substr(md5(text), 13, 2) AS INT) % 5)"
    n = "24 + CAST('0x' || substr(md5(text), 15, 2) AS INT) % 240"
    delta = "10 + CAST('0x' || substr(md5(text), 17, 2) AS INT) % 90"
    w = "16 * (4 + CAST('0x' || substr(md5(text), 19, 2) AS INT) % 60)"
    h = "16 * (3 + CAST('0x' || substr(md5(text), 21, 2) AS INT) % 45)"
    # round-5 sample-table parameters (encoder digest bytes 11-14):
    # two stts runs (n1 @ delta, n-n1 @ delta2) and a chunk-offset table
    n1 = f"1 + CAST('0x' || substr(md5(text), 23, 2) AS INT) % (({n}) - 1)"
    d2 = f"({delta}) + 1 + CAST('0x' || substr(md5(text), 25, 2) AS INT) % 30"
    dur = f"(({n1})) * ({delta}) + (({n}) - ({n1})) * ({d2})"
    cc = "1 + CAST('0x' || substr(md5(text), 27, 2) AS INT) % 7"
    fco = "64 + 8 * (CAST('0x' || substr(md5(text), 29, 2) AS INT) % 32)"
    return (
        "SELECT doc_id,\n"
        "  'isom' AS major_brand,\n"
        f"  CAST({ts} AS INTEGER) AS timescale,\n"
        f"  CAST({dur} AS BIGINT) AS duration_units,\n"
        "  CAST(1 AS INTEGER) AS track_count,\n"
        f"  CAST({w} AS INTEGER) AS width,\n"
        f"  CAST({h} AS INTEGER) AS height,\n"
        f"  CAST({n} AS BIGINT) AS n_samples,\n"
        f"  CAST((CAST({dur} AS BIGINT) * 1000000) // ({ts}) AS BIGINT)"
        " AS duration_us,\n"
        "  CAST(2 AS INTEGER) AS stts_entry_count,\n"
        f"  CAST({n} AS BIGINT) AS stts_sample_count,\n"
        f"  CAST({dur} AS BIGINT) AS stts_duration_units,\n"
        f"  CAST({cc} AS INTEGER) AS chunk_count,\n"
        f"  CAST({fco} AS BIGINT) AS first_chunk_offset\n"
        "FROM documents"
    )


def multimodal_extract_sql() -> str:
    return (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,\n"
        "       md5(text) AS digest\n"
        "FROM documents"
    )


def events_asof_sql(left_type: str = "purchase", right_type: str = "click") -> str:
    """Mirror of operators.temporal.asof_join — via DuckDB's NATIVE
    ``ASOF LEFT JOIN``: the union-window formulation on the Spark side
    and the real ASOF operator here check each other.  Right rows tied
    on (key, ts) are pre-reduced to the max-event_id row (the Spark
    window's tie rule)."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type, value"
        " FROM events),\n"
        "l AS MATERIALIZED (SELECT event_id, user_id, ts_us FROM ev\n"
        f"  WHERE event_type = '{left_type}'),\n"
        "r0 AS MATERIALIZED (SELECT user_id, ts_us,\n"
        "  max(event_id) AS event_id, arg_max(value, event_id) AS value\n"
        f"  FROM ev WHERE event_type = '{right_type}'"
        " GROUP BY user_id, ts_us)\n"
        "SELECT l.user_id, l.ts_us, l.event_id,\n"
        "  r0.ts_us AS r_ts_us, r0.event_id AS r_event_id,"
        " r0.value AS r_value,\n"
        "  l.ts_us - r0.ts_us AS gap_us\n"
        "FROM l ASOF LEFT JOIN r0\n"
        "  ON l.user_id = r0.user_id AND l.ts_us >= r0.ts_us"
    )


def events_range_join_sql(left_type: str = "purchase",
                          right_type: str = "error",
                          max_gap_us: int = 3_600_000_000) -> str:
    """Mirror of operators.temporal.range_join — the oracle states the
    predicate directly as an inequality join; the Spark side must reach
    the same pair set through the 3-adjacent-bucket equi-join."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type, value"
        " FROM events),\n"
        f"l AS (SELECT * FROM ev WHERE event_type = '{left_type}'),\n"
        f"r AS (SELECT * FROM ev WHERE event_type = '{right_type}')\n"
        "SELECT l.user_id, l.ts_us, l.event_id,\n"
        "  r.ts_us AS r_ts_us, r.event_id AS r_event_id,"
        " r.value AS r_value,\n"
        "  r.ts_us - l.ts_us AS gap\n"
        "FROM l JOIN r ON l.user_id = r.user_id\n"
        f"  AND abs(l.ts_us - r.ts_us) <= {max_gap_us}"
    )


def chunk_documents_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Mirror of operators.chunking.chunk_documents: identical tokenizer
    (TOKS_CTE), identical chunk-start rule (i*step while i*step < n),
    list_slice/slice both clamp the trailing chunk."""
    step = chunk_tokens - overlap
    return (
        f"WITH {TOKS_CTE}\n"
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,\n"
        f"  CAST(len(list_slice(toks, i * {step} + 1,"
        f" i * {step} + {chunk_tokens})) AS BIGINT) AS n_tokens,\n"
        f"  array_to_string(list_slice(toks, i * {step} + 1,"
        f" i * {step} + {chunk_tokens}), ' ') AS chunk_text\n"
        "FROM (SELECT doc_id, toks,\n"
        f"  unnest(range(0, (len(toks) - 1) // {step} + 1)) AS i\n"
        "  FROM toks_t WHERE len(toks) >= 1)"
    )


def duplicate_spans_sql(n: int = 8) -> str:
    """Mirror of operators.dedup.duplicate_ngram_spans: identical
    positioned n-grams, global gram-count filter, and per-document
    gaps-and-islands merge (adjacent coverage merges)."""
    return (
        f"WITH {TOKS_CTE},\n"
        "g AS MATERIALIZED (SELECT doc_id AS doc,\n"
        "  CAST(i - 1 AS BIGINT) AS pos,\n"
        f"  array_to_string(list_slice(toks, i, i + {n - 1}), ' ')"
        " AS gram\n"
        f"  FROM (SELECT doc_id, toks,"
        f" unnest(range(1, len(toks) - {n - 2})) AS i\n"
        f"        FROM toks_t WHERE len(toks) >= {n})),\n"
        "dup AS MATERIALIZED (SELECT gram FROM g GROUP BY gram"
        " HAVING count(*) > 1),\n"
        "cov AS MATERIALIZED (SELECT doc, pos AS s,"
        f" pos + {n - 1} AS e FROM g\n"
        "  WHERE gram IN (SELECT gram FROM dup)),\n"
        "fl AS MATERIALIZED (SELECT doc, s, e,\n"
        "  CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc ORDER BY"
        " s, e\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1\n"
        "    THEN 1 ELSE 0 END AS ni FROM cov),\n"
        "isl AS MATERIALIZED (SELECT doc, s, e,\n"
        "  sum(ni) OVER (PARTITION BY doc ORDER BY s, e\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island\n"
        "  FROM fl)\n"
        "SELECT doc AS doc_id, CAST(min(s) AS BIGINT) AS span_start,\n"
        "  CAST(max(e) AS BIGINT) AS span_end,\n"
        "  CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens\n"
        "FROM isl GROUP BY doc, island"
    )


def jaccard_join_sql(threshold_permille: int = 600) -> str:
    """BRUTE-FORCE mirror of operators.dedup.jaccard_join_prefix —
    deliberately no prefix filter: every shared-token pair is verified,
    so a match proves the Spark side's filter loses no pair.  Identical
    integer threshold (inter·1000 ≥ t‰·union) and 6dp division."""
    t = threshold_permille
    return (
        f"WITH {TOKS_CTE},\n"
        "ts AS MATERIALIZED (SELECT doc_id AS doc, unnest(toks) AS tok\n"
        "  FROM (SELECT doc_id, list_distinct(toks) AS toks FROM toks_t)),\n"
        "sz AS MATERIALIZED (SELECT doc, CAST(count(*) AS BIGINT) AS n"
        " FROM ts GROUP BY doc),\n"
        "pairs AS MATERIALIZED (\n"
        "  SELECT a.doc AS doc_a, b.doc AS doc_b,"
        " CAST(count(*) AS BIGINT) AS inter\n"
        "  FROM ts a JOIN ts b ON b.tok = a.tok AND a.doc < b.doc\n"
        "  GROUP BY a.doc, b.doc)\n"
        "SELECT doc_a, doc_b, inter,\n"
        "  CAST(sa.n + sb.n - inter AS BIGINT) AS union_sz,\n"
        "  round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard\n"
        "FROM pairs JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b\n"
        f"WHERE inter * 1000 >= {t} * (sa.n + sb.n - inter)"
    )


def temporal_reach_sql(rounds: int = 8) -> str:
    """Mirror of operators.temporal.contact_edges + temporal_reachability:
    per-event_type contact chains (lag over (ts, event_id) order), then
    ``rounds`` unrolled time-respecting earliest-arrival relaxations from
    the globally-earliest event's user.  The t >= arr(u) constraint in
    the join is the temporal-path condition; min-combining is
    NULL-handled with the explicit CASE (DuckDB/Spark least() NULL
    semantics differ — the CASE is engine-identical)."""
    parts = [
        "ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events)",
        "ce AS MATERIALIZED (SELECT src, dst, t FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst, ts_us AS t FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst)",
        "seed AS MATERIALIZED (SELECT user_id, ts_us FROM ev\n"
        "  ORDER BY ts_us, event_id LIMIT 1)",
        "a0 AS MATERIALIZED (SELECT u.user_id,\n"
        "  CASE WHEN u.user_id = (SELECT user_id FROM seed)\n"
        "       THEN (SELECT ts_us FROM seed) END AS arr\n"
        "  FROM (SELECT DISTINCT user_id FROM ev) u)",
    ]
    for r in range(1, rounds + 1):
        p = f"a{r - 1}"
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT p.user_id,\n"
            f"  CASE WHEN m.m IS NULL THEN p.arr\n"
            f"       WHEN p.arr IS NULL THEN m.m\n"
            f"       WHEN m.m < p.arr THEN m.m ELSE p.arr END AS arr\n"
            f"  FROM {p} p LEFT JOIN (\n"
            f"    SELECT e.dst AS user_id, min(e.t) AS m\n"
            f"    FROM ce e JOIN {p} q ON q.user_id = e.src\n"
            f"      AND q.arr IS NOT NULL AND e.t >= q.arr\n"
            f"    GROUP BY e.dst) m ON m.user_id = p.user_id)"
        )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        f"SELECT user_id, CAST(arr AS BIGINT) AS arr_us FROM a{rounds}\n"
        "WHERE arr IS NOT NULL"
    )


def temporal_motifs_sql(delta_us: int = 3_600_000_000) -> str:
    """Mirror of operators.temporal.temporal_motifs: delta-windowed
    2-path and cyclic-triangle motif counts over the contact sequence,
    strict time order (tied timestamps excluded, both engines)."""
    return f"""
WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,
  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
ce AS MATERIALIZED (SELECT src, dst, t FROM (
  SELECT lag(user_id) OVER (PARTITION BY event_type
           ORDER BY ts_us, event_id) AS src,
         user_id AS dst, ts_us AS t FROM ev)
  WHERE src IS NOT NULL AND src <> dst),
w2 AS MATERIALIZED (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w, e1.t AS t1, e2.t AS t2
  FROM ce e1 JOIN ce e2 ON e2.src = e1.dst
    AND e2.t > e1.t AND e2.t <= e1.t + {delta_us}
    AND e2.dst <> e1.src),
c3 AS MATERIALIZED (
  SELECT count(*) AS n FROM w2 JOIN ce e3
    ON e3.src = w2.w AND e3.dst = w2.u
    AND e3.t > w2.t2 AND e3.t <= w2.t1 + {delta_us})
SELECT 'path2' AS motif, CAST(count(*) AS BIGINT) AS n FROM w2
UNION ALL
SELECT 'cycle3' AS motif, CAST(n AS BIGINT) FROM c3
"""


def bowtie_sql(permille: int = 25, salt: str = "bowtie") -> str:
    """Mirror of __spark_entry__.q_bowtie / algos.bowtie: the Broder
    bow-tie classes over the hash-sparsified user contact graph, via
    DuckDB recursive transitive closures (the definition) — deliberately
    a different algorithm from the Spark side's SCC-peel +
    pointer-doubling reachability.  fw(v, r) reads "r reaches v"."""
    thr = permille * (1 << 48) // 1000
    h = _h48(
        f"'{salt}' || ':' || CAST(src AS VARCHAR) || ':' "
        "|| CAST(dst AS VARCHAR)"
    )
    return (
        "WITH RECURSIVE\n"
        "ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT DISTINCT src, dst FROM (\n"
        "    SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "             ORDER BY ts_us, event_id) AS src, user_id AS dst\n"
        "    FROM ev) WHERE src IS NOT NULL AND src <> dst)\n"
        f"  WHERE {h} < {thr}),\n"
        "users AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),\n"
        "fw(v, r) AS (\n"
        "  SELECT id, id FROM users\n"
        "  UNION\n"
        "  SELECT e.dst, fw.r FROM fw JOIN ce e ON e.src = fw.v),\n"
        "scc AS MATERIALIZED (SELECT f.v AS id, min(f.r) AS scc\n"
        "  FROM fw f JOIN fw g ON g.v = f.r AND g.r = f.v GROUP BY f.v),\n"
        "core AS MATERIALIZED (SELECT scc AS lab FROM (\n"
        "  SELECT scc, count(*) AS n FROM scc GROUP BY scc\n"
        "  ORDER BY n DESC, scc ASC LIMIT 1)),\n"
        "rp AS MATERIALIZED (SELECT DISTINCT f.v AS id FROM fw f\n"
        "  JOIN scc s ON s.id = f.r WHERE s.scc = (SELECT lab FROM core)),\n"
        "rm AS MATERIALIZED (SELECT DISTINCT f.r AS id FROM fw f\n"
        "  JOIN scc s ON s.id = f.v WHERE s.scc = (SELECT lab FROM core)),\n"
        "ins AS MATERIALIZED (SELECT rm.id FROM rm JOIN scc s ON s.id = rm.id\n"
        "  WHERE s.scc <> (SELECT lab FROM core)),\n"
        "outs AS MATERIALIZED (SELECT rp.id FROM rp JOIN scc s ON s.id = rp.id\n"
        "  WHERE s.scc <> (SELECT lab FROM core)),\n"
        "fin AS MATERIALIZED (SELECT DISTINCT f.v AS id FROM fw f\n"
        "  JOIN ins ON ins.id = f.r),\n"
        "bout AS MATERIALIZED (SELECT DISTINCT f.r AS id FROM fw f\n"
        "  JOIN outs ON outs.id = f.v),\n"
        "ue AS MATERIALIZED (SELECT src, dst FROM ce\n"
        "  UNION SELECT dst, src FROM ce),\n"
        "wf(v, r) AS (\n"
        "  SELECT id, id FROM users\n"
        "  UNION\n"
        "  SELECT e.dst, wf.r FROM wf JOIN ue e ON e.src = wf.v),\n"
        "wcc AS MATERIALIZED (SELECT v AS id, min(r) AS comp FROM wf"
        " GROUP BY v)\n"
        "SELECT u.id AS user_id,\n"
        "  CASE WHEN s.scc = (SELECT lab FROM core) THEN 'CORE'\n"
        "       WHEN rm.id IS NOT NULL THEN 'IN'\n"
        "       WHEN rp.id IS NOT NULL THEN 'OUT'\n"
        "       WHEN w.comp <> (SELECT comp FROM wcc\n"
        "                       WHERE id = (SELECT lab FROM core))\n"
        "         THEN 'DISCONNECTED'\n"
        "       WHEN fin.id IS NOT NULL AND bout.id IS NOT NULL THEN 'TUBE'\n"
        "       ELSE 'TENDRIL' END AS cls\n"
        "FROM users u JOIN scc s ON s.id = u.id JOIN wcc w ON w.id = u.id\n"
        "LEFT JOIN rm ON rm.id = u.id LEFT JOIN rp ON rp.id = u.id\n"
        "LEFT JOIN fin ON fin.id = u.id LEFT JOIN bout ON bout.id = u.id"
    )


def funnel_sql(
    first_type: str = "click",
    then_type: str = "purchase",
    horizon_us: int = 86_400_000_000,
) -> str:
    """Mirror of operators.sessions.funnel_conversion."""
    return (
        "WITH ev AS MATERIALIZED (SELECT user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "first AS MATERIALIZED (SELECT user_id, min(ts_us) AS t0 FROM ev\n"
        f"  WHERE event_type = '{first_type}' GROUP BY user_id),\n"
        "hits AS MATERIALIZED (SELECT DISTINCT e.user_id FROM ev e\n"
        "  JOIN first f ON f.user_id = e.user_id\n"
        f"  WHERE e.event_type = '{then_type}' AND e.ts_us > f.t0\n"
        f"    AND e.ts_us <= f.t0 + {horizon_us})\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_entered,\n"
        "  CAST(count(h.user_id) AS BIGINT) AS n_converted,\n"
        "  CASE WHEN count(*) > 0 THEN\n"
        "    round(count(h.user_id) * 1.0 / count(*), 6) END AS conversion\n"
        "FROM first f LEFT JOIN hits h ON h.user_id = f.user_id"
    )


def events_windowed_sliding_sql(window_us: int = 3_600_000_000,
                                slide_us: int = 1_800_000_000) -> str:
    """Mirror of the sliding-window entry query: each event joins every
    window whose epoch-aligned start covers it (window/slide overlapping
    copies generated via unnest(range) — the relational statement of
    what Spark's F.window(slide) expands to)."""
    k = window_us // slide_us
    ws = f"(tsu // {slide_us} - k.k) * {slide_us}"
    return (
        "WITH ev AS MATERIALIZED (SELECT event_type, value,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS tsu FROM events),\n"
        "w AS (SELECT event_type, value,\n"
        f"  CAST({ws} AS BIGINT) AS window_start_us\n"
        f"  FROM ev, (SELECT unnest(range({k})) AS k) k\n"
        f"  WHERE tsu >= {ws} AND tsu < {ws} + {window_us})\n"
        "SELECT window_start_us, event_type,\n"
        "  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value\n"
        "FROM w GROUP BY window_start_us, event_type"
    )


def sessionize_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        "WITH m AS MATERIALIZED (\n"
        "  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,\n"
        "         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL\n"
        f"              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}\n"
        "              THEN 1 ELSE 0 END AS is_new\n"
        "  FROM events\n"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),\n"
        "s AS MATERIALIZED (\n"
        "  SELECT user_id, ts_us,\n"
        "         sum(is_new) OVER (PARTITION BY user_id\n"
        "           ORDER BY ts_us, event_id) AS session_seq\n"
        "  FROM m)\n"
        "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,\n"
        "       CAST(count(*) AS BIGINT) AS n_events,\n"
        "       min(ts_us) AS start_us, max(ts_us) AS end_us\n"
        "FROM s GROUP BY user_id, session_seq"
    )


def events_windowed_sql() -> str:
    return (
        "SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,\n"
        "       event_type, CAST(count(*) AS BIGINT) AS n,\n"
        "       round(sum(value), 4) AS sum_value\n"
        "FROM events GROUP BY 1, 2"
    )


# ---------------------------------------------------------------------------
# round-5 additions: dyad census, vocabulary Zipf, tool transitions, SNM
# ---------------------------------------------------------------------------

def dyad_census_sql(loop_closure: bool = True) -> str:
    """Mirror of algos.stats.dyad_census over the directed edge set plus
    the per-conversation loop-closure edges (the triad census's graph, so
    the M/A/N triple complements the cyclic/transitive counts): per-pair
    direction bitmask, 1-row aggregate, n_null from C(V,2)."""
    closure = (
        "  UNION ALL\n"
        "  SELECT max(id) AS src, min(id) AS dst FROM vertices"
        " GROUP BY conv_id HAVING max(id) <> min(id)\n"
        if loop_closure
        else ""
    )
    return _graph_query(
        ", darc AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM edges\n"
        f"{closure}"
        ") WHERE src <> dst),\n"
        "pm AS MATERIALIZED (SELECT least(src, dst) AS lo,"
        " greatest(src, dst) AS hi,\n"
        "  bit_or(CASE WHEN src < dst THEN 1 ELSE 2 END) AS mask\n"
        "  FROM darc GROUP BY 1, 2),\n"
        "cnts AS MATERIALIZED (SELECT\n"
        "  COALESCE(SUM(CASE WHEN mask = 3 THEN 1 ELSE 0 END), 0) AS m,\n"
        "  COALESCE(SUM(CASE WHEN mask <> 3 THEN 1 ELSE 0 END), 0) AS a\n"
        "  FROM pm),\n"
        "nv AS (SELECT count(*) AS v FROM vertices)\n"
        "SELECT CAST(m AS BIGINT) AS n_mutual, CAST(a AS BIGINT) AS n_asym,\n"
        "  CAST(v * (v - 1) // 2 - m - a AS BIGINT) AS n_null\n"
        "FROM cnts, nv"
    )


def vocab_zipf_alpha_sql(fmin: int = 2) -> str:
    """Mirror of operators.profiling.vocab_zipf_alpha: per-term
    micro-unit rounding before the exact BIGINT sum (the powerlaw_alpha
    discipline, applied to token frequencies)."""
    return (
        f"WITH {TOKS_CTE},\n"
        "tok AS MATERIALIZED (SELECT unnest(toks) AS term FROM toks_t),\n"
        "f AS MATERIALIZED (SELECT term, count(*) AS f FROM tok"
        f" GROUP BY term HAVING count(*) >= {fmin}),\n"
        "terms AS MATERIALIZED (SELECT CAST(round(ln(f * 1.0 /"
        f" {fmin - 0.5}) * 1000000, 0) AS BIGINT) AS lt FROM f)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_tail,\n"
        "  CASE WHEN COALESCE(sum(lt), 0) > 0 THEN\n"
        "    round(1.0 + count(*) * 1000000.0 / sum(lt), 6) END AS alpha\n"
        "FROM terms"
    )


def tool_transitions_sql() -> str:
    """Mirror of sources.transcripts.tool_transitions: per-conversation
    lag over tool turns, pair counts, row-conditional 6dp probability."""
    return _graph_query(
        ", tt AS MATERIALIZED (SELECT conv_id, turn_idx, tool"
        " FROM transcripts WHERE tool IS NOT NULL),\n"
        "pr AS MATERIALIZED (SELECT\n"
        "  lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)"
        " AS prev_tool, tool FROM tt),\n"
        "n AS MATERIALIZED (SELECT prev_tool, tool,"
        " CAST(count(*) AS BIGINT) AS n\n"
        "  FROM pr WHERE prev_tool IS NOT NULL GROUP BY 1, 2),\n"
        "tot AS MATERIALIZED (SELECT prev_tool, sum(n) AS tot FROM n"
        " GROUP BY prev_tool)\n"
        "SELECT n.prev_tool, n.tool, n.n,\n"
        "  round(n.n * 1.0 / tot.tot, 6) AS p\n"
        "FROM n JOIN tot USING (prev_tool)"
    )


def markov_stationary_sql(iterations: int = 8) -> str:
    """Mirror of operators.cooccurrence.markov_stationary: identical
    per-actor lag chain, k x k counts, and per-term truncating-division
    power iteration from the uniform 1e6 // k start."""
    parts = [
        "mpr AS MATERIALIZED (SELECT\n"
        "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        " AS a,\n"
        "  event_type AS b FROM events)",
        "mc AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM mpr WHERE a IS NOT NULL GROUP BY a, b)",
        "mtot AS MATERIALIZED (SELECT a, CAST(sum(n) AS BIGINT) AS tot\n"
        "  FROM mc GROUP BY a)",
        "mcm AS MATERIALIZED (SELECT c.a, c.b, c.n, t.tot\n"
        "  FROM mc c JOIN mtot t USING (a))",
        "mst AS MATERIALIZED (SELECT DISTINCT event_type AS state"
        " FROM events)",
        "mk AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k FROM mst)",
        "sp0 AS MATERIALIZED (SELECT state,\n"
        "  CAST(1000000 // (SELECT k FROM mk) AS BIGINT) AS p FROM mst)",
    ]
    for i in range(1, iterations + 1):
        prev = f"sp{i - 1}"
        parts.append(
            f"sp{i} AS MATERIALIZED (\n"
            f"  SELECT s.state, CAST(COALESCE(m.p2, 0) AS BIGINT) AS p\n"
            f"  FROM mst s LEFT JOIN (\n"
            f"    SELECT cm.b AS state, SUM((q.p * cm.n) // cm.tot) AS p2\n"
            f"    FROM mcm cm JOIN {prev} q ON q.state = cm.a\n"
            f"    GROUP BY cm.b) m ON m.state = s.state)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        f"SELECT state, p AS stationary_micros FROM sp{iterations}"
    )


def hitting_time_sql(target: str, iterations: int = 8) -> str:
    """Mirror of operators.cooccurrence.hitting_time: identical lag
    chain and k x k counts, then the unrolled value iteration
    h'(v) = [v != target] * (1e6 + sum_u (h_u * c_vu) // tot_v) from
    h = 0 (all quantities non-negative, so // == div)."""
    tgt = target.replace("'", "''")
    parts = [
        "hpr AS MATERIALIZED (SELECT\n"
        "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        " AS a,\n"
        "  event_type AS b FROM events)",
        "hc AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM hpr WHERE a IS NOT NULL GROUP BY a, b)",
        "htot AS MATERIALIZED (SELECT a, CAST(sum(n) AS BIGINT) AS tot\n"
        "  FROM hc GROUP BY a)",
        "hcm AS MATERIALIZED (SELECT c.a, c.b, c.n, t.tot\n"
        "  FROM hc c JOIN htot t USING (a))",
        "hst AS MATERIALIZED (SELECT DISTINCT event_type AS state"
        " FROM events)",
        "hh0 AS MATERIALIZED (SELECT state, CAST(0 AS BIGINT) AS h"
        " FROM hst)",
    ]
    for i in range(1, iterations + 1):
        prev = f"hh{i - 1}"
        parts.append(
            f"hh{i} AS MATERIALIZED (\n"
            f"  SELECT s.state,\n"
            f"    CAST(CASE WHEN s.state = '{tgt}' THEN 0\n"
            f"      ELSE 1000000 + COALESCE(m.s2, 0) END AS BIGINT) AS h\n"
            f"  FROM hst s LEFT JOIN (\n"
            f"    SELECT cm.a AS state, SUM((q.h * cm.n) // cm.tot) AS s2\n"
            f"    FROM hcm cm JOIN {prev} q ON q.state = cm.b\n"
            f"    GROUP BY cm.a) m ON m.state = s.state)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        f"SELECT state, h AS hitting_micros FROM hh{iterations}"
    )


def doc_novelty_sql() -> str:
    """Mirror of operators.dedup.doc_novelty (3-grams): the shared
    shingle CTEs, min(doc_id) first-occurrence table, per-doc counts,
    exact-ratio micro division."""
    return (
        f"WITH {TOKS_CTE},\n{_SHINGLES_CTE},\n"
        "nv_f AS MATERIALIZED (SELECT shingle,"
        " CAST(min(doc_id) AS BIGINT) AS fd FROM sh GROUP BY shingle),\n"
        "nv_p AS MATERIALIZED (\n"
        "  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,\n"
        "    CAST(sum(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_novel\n"
        "  FROM sh s JOIN nv_f f USING (shingle) GROUP BY s.doc_id)\n"
        "SELECT doc_id, n_grams, n_novel,\n"
        "  CAST((1000000 * n_novel - (1000000 * n_novel) % n_grams)"
        " // n_grams AS BIGINT) AS novelty_micros\n"
        "FROM nv_p"
    )


def temperature_mixture_sql() -> str:
    """Mirror of operators.packing.temperature_mixture: identical
    tokenize, sqrt (IEEE-correctly-rounded in both engines) rounded once
    to micros, BIGINT normalizer, exact-ratio shares."""
    return (
        "WITH tm_p AS MATERIALIZED (\n"
        "  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs,\n"
        "    CAST(SUM(len(list_filter(string_split_regex(lower(text),"
        " '\\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens\n"
        "  FROM documents GROUP BY source),\n"
        "tm_w AS MATERIALIZED (\n"
        "  SELECT stratum, n_docs, n_tokens,\n"
        "    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000, 0)"
        " AS BIGINT) AS weight_micros\n"
        "  FROM tm_p),\n"
        "tm_d AS (SELECT CAST(SUM(weight_micros) AS BIGINT) AS d"
        " FROM tm_w)\n"
        "SELECT stratum, n_docs, n_tokens, weight_micros,\n"
        "  CAST((1000000 * weight_micros"
        " - (1000000 * weight_micros) % d) // d AS BIGINT)"
        " AS share_micros\n"
        "FROM tm_w, tm_d"
    )


def chao1_vocab_sql() -> str:
    """Mirror of operators.profiling.chao1_vocab: identical tokenize,
    one aggregate over the term counts, the same fixed float expression
    for chao1 (f2=0 branch included), exact-ratio Good–Turing mass."""
    return (
        f"WITH {TOKS_CTE},\n"
        "c1_tf AS MATERIALIZED (\n"
        "  SELECT term, CAST(count(*) AS BIGINT) AS c FROM (\n"
        "    SELECT unnest(toks) AS term FROM toks_t) GROUP BY term),\n"
        "c1_g AS (SELECT CAST(count(*) AS BIGINT) AS v_obs,\n"
        "  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,\n"
        "  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,\n"
        "  CAST(sum(c) AS BIGINT) AS n_tokens FROM c1_tf)\n"
        "SELECT v_obs, f1, f2, n_tokens,\n"
        "  CASE WHEN f2 > 0 THEN\n"
        "    round(CAST(v_obs AS DOUBLE) + (f1 * f1) / (2.0 * f2), 6)\n"
        "  ELSE round(CAST(v_obs AS DOUBLE) + (f1 * (f1 - 1)) / 2.0, 6)\n"
        "  END AS chao1,\n"
        "  CASE WHEN n_tokens > 0 THEN\n"
        "    CAST((1000000 * f1 - (1000000 * f1) % n_tokens)"
        " // n_tokens AS BIGINT)\n"
        "  END AS p_unseen_micros\n"
        "FROM c1_g"
    )


def hotset_churn_sql(k: int = 20) -> str:
    """Mirror of operators.analytics.hotset_churn: identical day
    derivation, per-day (count DESC, key ASC) top-k, previous-day
    shift join, one rounded Jaccard division (NULL when no previous
    day exists)."""
    return (
        "WITH hc_c AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
        " AS BIGINT) AS day,\n"
        "    user_id AS key, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM events GROUP BY 1, 2),\n"
        "hc_top AS MATERIALIZED (\n"
        "  SELECT day, key FROM (\n"
        "    SELECT day, key,\n"
        "      row_number() OVER (PARTITION BY day"
        " ORDER BY n DESC, key ASC) AS r\n"
        f"    FROM hc_c) WHERE r <= {k}),\n"
        "hc_sz AS MATERIALIZED (SELECT day,"
        " CAST(count(*) AS BIGINT) AS n_top FROM hc_top GROUP BY day),\n"
        "hc_com AS MATERIALIZED (\n"
        "  SELECT t.day, CAST(count(*) AS BIGINT) AS n_common\n"
        "  FROM hc_top t JOIN (SELECT day + 1 AS day, key FROM hc_top) p\n"
        "    USING (day, key) GROUP BY t.day),\n"
        "hc_psz AS MATERIALIZED (SELECT day + 1 AS day,"
        " n_top AS n_prev FROM hc_sz)\n"
        "SELECT s.day, s.n_top,\n"
        "  CAST(COALESCE(p.n_prev, 0) AS BIGINT) AS n_prev,\n"
        "  CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,\n"
        "  CASE WHEN p.n_prev IS NOT NULL THEN\n"
        "    round(CAST(COALESCE(c.n_common, 0) AS DOUBLE)\n"
        "      / (s.n_top + p.n_prev - COALESCE(c.n_common, 0)), 6)\n"
        "  END AS jaccard\n"
        "FROM hc_sz s LEFT JOIN hc_psz p ON p.day = s.day\n"
        "LEFT JOIN hc_com c ON c.day = s.day"
    )


def benford_deviation_sql() -> str:
    """Mirror of operators.profiling.benford_deviation: identical micro
    quantization, leading digit from the INTEGER's decimal rendering,
    exact-ratio shares, and the same nine Python-computed expected-share
    literals."""
    import math

    exp_case = " ".join(
        f"WHEN {k} THEN {int(round(math.log10(1.0 + 1.0 / k) * 1000000))}"
        for k in range(1, 10)
    )
    return (
        "WITH bf_d AS MATERIALIZED (\n"
        "  SELECT CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS BIGINT)"
        " AS digit\n"
        "  FROM (SELECT CAST(round(value * 1000000, 0) AS BIGINT) AS vm\n"
        "    FROM events WHERE value IS NOT NULL)\n"
        "  WHERE vm > 0),\n"
        "bf_t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM bf_d),\n"
        "bf_c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM bf_d"
        " GROUP BY digit)\n"
        "SELECT digit, n,\n"
        "  CAST((1000000 * n - (1000000 * n) % tot) // tot AS BIGINT)"
        " AS share_micros,\n"
        f"  CAST(CASE digit {exp_case} END AS BIGINT) AS expected_micros,\n"
        "  CAST((1000000 * n - (1000000 * n) % tot) // tot\n"
        f"    - CASE digit {exp_case} END AS BIGINT) AS dev_micros\n"
        "FROM bf_c, bf_t"
    )


def bootstrap_ci_sql(
    replicates: int = 64,
    rate: float = 0.5,
    alpha: float = 0.025,
    salt: str = "boot",
) -> str:
    """Mirror of operators.profiling.bootstrap_ci: the same hash48
    Bernoulli membership per (salt, replicate, key), truncating-division
    replicate means, and integer-rank percentile picks."""
    lo_rank = int(alpha * replicates) + 1
    hi_rank = replicates - int(alpha * replicates)
    thresh = int(rate * (1 << 48))
    h = _h48(
        f"'{salt}:' || CAST(b AS VARCHAR) || ':' || CAST(k AS VARCHAR)"
    )
    return (
        "WITH bc_base AS MATERIALIZED (\n"
        "  SELECT CAST(event_id AS VARCHAR) AS k,\n"
        "    CAST(round(value * 1000000, 0) AS BIGINT) AS vm\n"
        "  FROM events WHERE round(value * 1000000, 0) IS NOT NULL),\n"
        "bc_full AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(CAST(sum(vm) AS BIGINT) // count(*) AS BIGINT) AS m"
        " FROM bc_base),\n"
        "bc_kept AS MATERIALIZED (\n"
        "  SELECT t.b, vm FROM bc_base,"
        f" range(0, {replicates}) t(b)\n"
        f"  WHERE {h} < {thresh}),\n"
        "bc_means AS MATERIALIZED (\n"
        "  SELECT b, CAST(CAST(sum(vm) AS BIGINT) // count(*) AS BIGINT)"
        " AS m\n"
        "  FROM bc_kept GROUP BY b),\n"
        "bc_rk AS (SELECT m,"
        " row_number() OVER (ORDER BY m ASC, b ASC) AS r FROM bc_means)\n"
        "SELECT (SELECT n FROM bc_full) AS n_events,\n"
        "  CAST(count(*) AS BIGINT) AS n_replicates,\n"
        "  (SELECT m FROM bc_full) AS mean_micros,\n"
        f"  CAST(max(CASE WHEN r = {lo_rank} THEN m END) AS BIGINT)"
        " AS lo_micros,\n"
        f"  CAST(max(CASE WHEN r = {hi_rank} THEN m END) AS BIGINT)"
        " AS hi_micros\n"
        "FROM bc_rk"
    )


def source_jsd_sql() -> str:
    """Mirror of operators.cooccurrence.source_jsd: identical per-term
    fixed float expression (products routed through DOUBLE before
    multiplication), one micro rounding per term / residual, truncating
    final halving."""
    return (
        "WITH sj_tf AS MATERIALIZED (\n"
        "  SELECT g, tok, CAST(count(*) AS BIGINT) AS c FROM (\n"
        "    SELECT source AS g,\n"
        "      unnest(list_filter(string_split_regex(lower(text),"
        " '\\s+'), x -> x <> '')) AS tok\n"
        "    FROM documents) GROUP BY g, tok),\n"
        "sj_tot AS MATERIALIZED (SELECT g,"
        " CAST(SUM(c) AS BIGINT) AS t FROM sj_tf GROUP BY g),\n"
        "sj_sh AS MATERIALIZED (\n"
        "  SELECT a.g AS source_a, b.g AS source_b, a.c AS ca, b.c AS cb,\n"
        "    ta.t AS ta, tb.t AS tb\n"
        "  FROM sj_tf a JOIN sj_tf b ON a.tok = b.tok AND a.g < b.g\n"
        "  JOIN sj_tot ta ON ta.g = a.g JOIN sj_tot tb ON tb.g = b.g),\n"
        "sj_terms AS MATERIALIZED (\n"
        "  SELECT source_a, source_b, ta, tb, ca, cb,\n"
        "    CAST(round((CAST(ca AS DOUBLE) / ta)\n"
        "      * ln((2.0 * ca * tb) / (CAST(ca AS DOUBLE) * tb\n"
        "        + CAST(cb AS DOUBLE) * ta)) * 1000000, 0)"
        " AS BIGINT) AS xa,\n"
        "    CAST(round((CAST(cb AS DOUBLE) / tb)\n"
        "      * ln((2.0 * cb * ta) / (CAST(ca AS DOUBLE) * tb\n"
        "        + CAST(cb AS DOUBLE) * ta)) * 1000000, 0)"
        " AS BIGINT) AS xb\n"
        "  FROM sj_sh),\n"
        "sj_g AS MATERIALIZED (\n"
        "  SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared,\n"
        "    CAST(SUM(xa) AS BIGINT) AS sa, CAST(SUM(xb) AS BIGINT) AS sb,\n"
        "    CAST(SUM(ca) AS BIGINT) AS csa,"
        " CAST(SUM(cb) AS BIGINT) AS csb,\n"
        "    CAST(MAX(ta) AS BIGINT) AS ta, CAST(MAX(tb) AS BIGINT) AS tb\n"
        "  FROM sj_terms GROUP BY source_a, source_b)\n"
        "SELECT source_a, source_b, n_shared,\n"
        "  CAST((sa + CAST(round((1.0 - CAST(csa AS DOUBLE) / ta)\n"
        "        * ln(2.0) * 1000000, 0) AS BIGINT)\n"
        "      + sb + CAST(round((1.0 - CAST(csb AS DOUBLE) / tb)\n"
        "        * ln(2.0) * 1000000, 0) AS BIGINT)) // 2 AS BIGINT)"
        " AS jsd_micros\n"
        "FROM sj_g"
    )


def conversion_prob_sql(target: str, sink: str, iterations: int = 8) -> str:
    """Mirror of operators.cooccurrence.conversion_prob: identical lag
    chain and k x k counts, then the unrolled absorbing-chain value
    iteration with target pinned to 1e6, sink pinned to 0, and the same
    per-term truncating division (nonnegative, so ``//`` == ``div``)."""
    tgt = target.replace("'", "''")
    snk = sink.replace("'", "''")
    parts = [
        "cpr AS MATERIALIZED (SELECT\n"
        "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        " AS a,\n"
        "  event_type AS b FROM events)",
        "cpc AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM cpr WHERE a IS NOT NULL GROUP BY a, b)",
        "cptot AS MATERIALIZED (SELECT a, CAST(sum(n) AS BIGINT) AS tot\n"
        "  FROM cpc GROUP BY a)",
        "cpcm AS MATERIALIZED (SELECT c.a, c.b, c.n, t.tot\n"
        "  FROM cpc c JOIN cptot t USING (a))",
        "cpst AS MATERIALIZED (SELECT DISTINCT event_type AS state"
        " FROM events)",
        "cpp0 AS MATERIALIZED (SELECT state, CAST(0 AS BIGINT) AS p"
        " FROM cpst)",
    ]
    for i in range(1, iterations + 1):
        prev = f"cpp{i - 1}"
        parts.append(
            f"cpp{i} AS MATERIALIZED (\n"
            f"  SELECT s.state,\n"
            f"    CAST(CASE WHEN s.state = '{tgt}' THEN 1000000\n"
            f"      WHEN s.state = '{snk}' THEN 0\n"
            f"      ELSE COALESCE(m.s2, 0) END AS BIGINT) AS p\n"
            f"  FROM cpst s LEFT JOIN (\n"
            f"    SELECT cm.a AS state, SUM((q.p * cm.n) // cm.tot) AS s2\n"
            f"    FROM cpcm cm JOIN {prev} q ON q.state = cm.b\n"
            f"    GROUP BY cm.a) m ON m.state = s.state)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        f"SELECT state, p AS p_micros FROM cpp{iterations}"
    )


def kneser_ney_sql(top: int = 50, min_count: int = 2) -> str:
    """Mirror of operators.ngram_lm.kneser_ney_bigram: identical bigram
    extraction, exact-integer KN statistics, and the SAME fixed float
    expression tree (D = 0.75 exact in binary) rounded once to 6dp."""
    return f"""
WITH {TOKS_CTE},
knb AS MATERIALIZED (
  SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM toks_t, UNNEST(range(1, len(toks))) AS t(i)),
knc AS MATERIALIZED (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs
  FROM knb GROUP BY w1, w2),
knt AS MATERIALIZED (
  SELECT w1, CAST(sum(n_pairs) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n1_fwd
  FROM knc GROUP BY w1),
knr AS MATERIALIZED (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1_rev FROM knc GROUP BY w2),
knn AS (SELECT CAST(count(*) AS DOUBLE) AS nbt FROM knc)
SELECT w1, w2, n_pairs, n1_fwd, n1_rev,
  round((CAST(n_pairs AS DOUBLE) - 0.75) / tot
    + ((0.75 * n1_fwd) / tot) * (CAST(n1_rev AS DOUBLE) / nbt), 6) AS p_kn
FROM knc JOIN knt USING (w1) JOIN knr USING (w2), knn
WHERE n_pairs >= {min_count}
ORDER BY n_pairs DESC, w1 ASC, w2 ASC LIMIT {top}
"""


def sorted_neighborhood_sql(
    window: int = 4, key_len: int = 16, threshold: float = 0.3
) -> str:
    """Mirror of operators.dedup.sorted_neighborhood_pairs.  The oracle
    ranks with a plain global window (fine at sf0.01; the Spark side uses
    the distributed dense-id machinery) and verifies candidates against
    the module's shared brute-force Jaccard CTEs — pairs ride
    (least, greatest) into the doc_id-ordered jac table."""
    return (
        f"WITH {_JACCARD_CTES},\n"
        "rk AS MATERIALIZED (SELECT doc_id,\n"
        "  row_number() OVER (ORDER BY"
        " substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),"
        f" 1, {key_len}), doc_id) - 1 AS rank\n"
        "  FROM documents),\n"
        "cand AS MATERIALIZED (SELECT x.doc_id AS a, y.doc_id AS b,\n"
        "  CAST(y.rank - x.rank AS BIGINT) AS rank_gap\n"
        "  FROM rk x JOIN rk y ON y.rank > x.rank"
        f" AND y.rank <= x.rank + {window})\n"
        "SELECT c.a, c.b, c.rank_gap, j.jaccard\n"
        "FROM cand c JOIN jac j ON j.a = least(c.a, c.b)"
        " AND j.b = greatest(c.a, c.b)\n"
        f"WHERE j.jaccard >= {threshold}"
    )


def eigenvector_sql(iterations: int = 6, loop_closure: bool = True) -> str:
    """Unrolled max-normalized power iteration — identical integer rule
    as algos.centrality.eigenvector_centrality (exact BIGINT gather,
    (10^6·s) // max per round), over the loop-closed arc set the entry
    query feeds it (the scc/triad convention — cycles sustain spectral
    mass; the raw reply DAG decays)."""
    closure = (
        "  UNION ALL\n"
        "  SELECT max(id) AS src, min(id) AS dst FROM vertices"
        " GROUP BY conv_id HAVING max(id) <> min(id)\n"
        if loop_closure
        else ""
    )
    parts = [
        "earc AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT src, dst FROM edges\n"
        f"{closure}"
        "))",
        "x0 AS MATERIALIZED (SELECT id, CAST(1000000 AS BIGINT) AS eig "
        "FROM vertices)",
    ]
    for r in range(1, iterations + 1):
        prev = f"x{r - 1}"
        parts.append(
            f"s{r} AS MATERIALIZED (\n"
            f"  SELECT v.id, CAST(COALESCE(m.s, 0) AS BIGINT) AS s\n"
            f"  FROM {prev} v LEFT JOIN (\n"
            f"    SELECT e.dst AS id, SUM(p.eig) AS s\n"
            f"    FROM earc e JOIN {prev} p ON p.id = e.src\n"
            f"    GROUP BY e.dst) m ON m.id = v.id)"
        )
        parts.append(
            f"mx{r} AS MATERIALIZED (SELECT max(s) AS mx FROM s{r})"
        )
        parts.append(
            f"x{r} AS MATERIALIZED (\n"
            f"  SELECT id, CAST(CASE WHEN mx > 0 THEN (1000000 * s) // mx\n"
            f"    ELSE 0 END AS BIGINT) AS eig\n"
            f"  FROM s{r}, mx{r})"
        )
    joined = ",\n".join(parts)
    return _graph_query(f", {joined}\nSELECT id, eig FROM x{iterations}")


# ---------------------------------------------------------------------------
# round-5 additions (wave 2): cohorts, rollup, pivot, MAD outliers
# ---------------------------------------------------------------------------

WEEK_US = 7 * 24 * 3600 * 1_000_000


def retention_cohorts_sql() -> str:
    """Mirror of operators.analytics.retention_cohorts: absolute integer
    week index (epoch_us // WEEK_US), cohort = each user's min week."""
    return (
        f"WITH wk AS (SELECT user_id, epoch_us(ts) // {WEEK_US} AS week "
        f"FROM events),\n"
        "act AS (SELECT DISTINCT user_id, week FROM wk),\n"
        "coh AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)\n"
        "SELECT CAST(cohort_week AS BIGINT) AS cohort_week,\n"
        "       CAST(week - cohort_week AS BIGINT) AS week_offset,\n"
        "       CAST(count(*) AS BIGINT) AS n_users\n"
        "FROM act JOIN coh USING (user_id) GROUP BY 1, 2"
    )


def events_rollup_sql() -> str:
    """Mirror of operators.analytics.events_rollup: the ROLLUP lattice
    with the same sentinel coalesces and grouping-id bit layout."""
    return (
        "SELECT COALESCE(event_type, '(all)') AS event_type,\n"
        "       CAST(COALESCE(day_us, -1) AS BIGINT) AS day_us,\n"
        "       CAST(GROUPING(event_type) * 2 + GROUPING(day_us) AS BIGINT)"
        " AS gid,\n"
        "       CAST(count(*) AS BIGINT) AS n,\n"
        "       CAST(sum(v_micros) AS BIGINT) AS sum_value_micros\n"
        "FROM (SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,\n"
        "             CAST(round(value * 1000000) AS BIGINT) AS v_micros\n"
        "      FROM events)\n"
        "GROUP BY ROLLUP (event_type, day_us)"
    )


def events_pivot_sql(event_types: tuple[str, ...] = (
        "click", "error", "purchase", "signup", "view")) -> str:
    """Mirror of operators.analytics.events_pivot: conditional counts —
    DuckDB's PIVOT statement can't nest in a view-body CTE, and the
    conditional-aggregate form is the same plan anyway."""
    cols = ",\n".join(
        f"       CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{t}"
        for t in event_types
    )
    return (
        "SELECT user_id,\n"
        f"{cols},\n"
        "       CAST(count(*) AS BIGINT) AS n_total\n"
        "FROM events GROUP BY user_id"
    )


def value_outliers_mad_sql(k: int = 3) -> str:
    """Mirror of operators.analytics.value_outliers_mad: integer cents,
    lower-median rank rn*2 = n + n%2 for both the median and the MAD."""
    return (
        "WITH cents AS (SELECT event_type,"
        " CAST(round(value * 100) AS BIGINT) AS cents FROM events),\n"
        "r AS (SELECT event_type, cents,\n"
        "  row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,\n"
        "  count(*) OVER (PARTITION BY event_type) AS n FROM cents),\n"
        "med AS (SELECT event_type, CAST(n AS BIGINT) AS n,"
        " cents AS median_cents FROM r WHERE rn * 2 = n + n % 2),\n"
        "dev AS MATERIALIZED (SELECT c.event_type, m.n, m.median_cents,\n"
        "  abs(c.cents - m.median_cents) AS dev\n"
        "  FROM cents c JOIN med m USING (event_type)),\n"
        "rd AS (SELECT event_type, dev,\n"
        "  row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,\n"
        "  count(*) OVER (PARTITION BY event_type) AS n2 FROM dev),\n"
        "madt AS (SELECT event_type, dev AS mad_cents FROM rd"
        " WHERE rn * 2 = n2 + n2 % 2)\n"
        "SELECT d.event_type, d.n, d.median_cents, t.mad_cents,\n"
        f"  CAST(sum(CASE WHEN d.dev > {k} * t.mad_cents THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_outliers\n"
        "FROM dev d JOIN madt t USING (event_type) GROUP BY 1, 2, 3, 4"
    )


def pii_scan_sql() -> str:
    """Mirror of operators.pii: same contact suffix, same pattern set,
    same sequential redaction order (URL -> EMAIL -> SSN -> PHONE ->
    IPV4).  Patterns are written in the Java-regex/RE2 common subset;
    DuckDB's regexp_replace needs the explicit 'g' flag to match
    Spark's replace-all default."""
    pats = {
        "url": "https?://[A-Za-z0-9._/%-]+",
        "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "ssn": "\\b\\d{3}-\\d{2}-\\d{4}\\b",
        "phone": "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
        "ipv4": "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    }
    counts = ",\n".join(
        f"  CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_{n}"
        for n, p in pats.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for p in pats.values()
    )
    red = "text"
    for n, p in pats.items():
        tok = "<IP>" if n == "ipv4" else f"<{n.upper()}>"
        red = f"regexp_replace({red}, '{p}', '{tok}', 'g')"
    return (
        "WITH src AS (SELECT doc_id,\n"
        "  text || ' reach user' || CAST(doc_id AS VARCHAR)\n"
        "    || '@example.com or https://host' || CAST(doc_id AS VARCHAR)\n"
        "    || '.example/path tel 415-555-'\n"
        "    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')\n"
        "    || ' ssn 123-45-6789 ip 10.' || CAST(doc_id % 200 AS VARCHAR)\n"
        "    || '.0.' || CAST(doc_id % 250 AS VARCHAR)\n"
        "    || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@example.org'\n"
        "            ELSE '' END AS text\n"
        "  FROM documents)\n"
        "SELECT doc_id,\n"
        f"{counts},\n"
        f"  CAST({total} AS BIGINT) AS n_pii,\n"
        f"  md5({red}) AS redacted_md5\n"
        "FROM src"
    )


def doc_lm_cost_sql() -> str:
    """Mirror of operators.ngram_lm.doc_lm_cost: add-one-smoothed bigram
    cost in integer micro-nats, rounded once per distinct corpus bigram
    (both ln operands exact BIGINTs, so the double is engine-identical)."""
    return f"""
WITH {TOKS_CTE},
bg AS MATERIALIZED (
  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM toks_t, UNNEST(range(1, len(toks))) AS t(i)),
pp AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
  FROM bg GROUP BY 1, 2, 3),
c12 AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
  FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
vocab AS (SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(toks) AS tok FROM toks_t)),
model AS MATERIALIZED (
  SELECT w1, w2,
         CAST(round(1000000 * ln(CAST(n1 + v AS DOUBLE) / (n12 + 1.0)))
              AS BIGINT) AS cost
  FROM c12 JOIN c1 USING (w1) CROSS JOIN vocab),
pd AS (SELECT doc_id, sum(m) AS n_bigrams, sum(m * cost) AS sum_cost
  FROM pp JOIN model USING (w1, w2) GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(sum_cost, 0) AS BIGINT) AS sum_cost_micros,
  CAST(CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0
       ELSE sum_cost // n_bigrams END AS BIGINT) AS avg_cost_micros
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def skipgram_pairs_sql(window: int = 2, min_count: int = 2) -> str:
    """Mirror of operators.cooccurrence.skipgram_pairs: window-level
    directed (center, context) skip-gram pair counts via the identical
    nested list-transform fan-out."""
    w = window
    having = f"HAVING count(*) >= {min_count}" if min_count > 1 else ""
    return f"""
WITH {TOKS_CTE},
pairs AS (
  SELECT unnest(flatten(list_transform(range(1, len(toks) + 1), i ->
    list_transform(list_filter(range(greatest(1, i - {w}),
                                     least(len(toks), i + {w}) + 1),
                               j -> j <> i),
                   j -> {{'center': toks[CAST(i AS INT)],
                          'context': toks[CAST(j AS INT)]}})))) AS p
  FROM toks_t WHERE len(toks) >= 2)
SELECT p.center AS center, p.context AS context,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2 {having}
"""


def rrf_fusion_sql(k: int = 5, c: int = 60, num_queries: int = 20) -> str:
    """Mirror of operators.similarity.rrf_fuse over the three ANN
    rankers: each full ranker statement nests as a CTE body (DuckDB
    allows a WITH inside a CTE), reciprocal terms rounded once to
    micros, BIGINT sum, (rrf DESC, neighbor ASC) top-k."""
    r1 = ann_cosine_topk_sql(5, num_queries)
    r2 = ann_lsh_topk_sql(3, 8, num_queries)
    r3 = ivf_topk_sql(3, 2, 8, 2, num_queries)
    return f"""
WITH r1 AS MATERIALIZED ({r1}),
r2 AS MATERIALIZED ({r2}),
r3 AS MATERIALIZED ({r3}),
u AS (
  SELECT query_id, neighbor_id,
         CAST(round(1000000.0 / ({c} + rank)) AS BIGINT) AS m FROM r1
  UNION ALL
  SELECT query_id, neighbor_id,
         CAST(round(1000000.0 / ({c} + rank)) AS BIGINT) AS m FROM r2
  UNION ALL
  SELECT query_id, neighbor_id,
         CAST(round(1000000.0 / ({c} + rank)) AS BIGINT) AS m FROM r3),
f AS (SELECT query_id, neighbor_id, CAST(sum(m) AS BIGINT) AS rrf_micros,
             CAST(count(*) AS BIGINT) AS n_lists
  FROM u GROUP BY 1, 2)
SELECT query_id, neighbor_id, rrf_micros, n_lists, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY rrf_micros DESC, neighbor_id ASC) AS INT) AS rank FROM f)
WHERE rank <= {k}
"""


def source_vocab_overlap_sql() -> str:
    """Mirror of operators.cooccurrence.source_vocab_overlap: pairwise
    per-source vocabulary Jaccard, identical tokenizer, 6dp division."""
    return """
WITH toks AS MATERIALIZED (
  SELECT DISTINCT source AS g, tok FROM (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents)),
nv AS MATERIALIZED (SELECT g, CAST(count(*) AS BIGINT) AS n
  FROM toks GROUP BY 1),
pairs AS (
  SELECT a.g AS source_a, b.g AS source_b, CAST(count(*) AS BIGINT) AS overlap
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.g < b.g
  GROUP BY 1, 2)
SELECT p.source_a, p.source_b, na.n AS n_a, nb.n AS n_b, p.overlap,
       round(CAST(p.overlap AS DOUBLE) / (na.n + nb.n - p.overlap), 6)
         AS jaccard
FROM pairs p JOIN nv na ON na.g = p.source_a JOIN nv nb ON nb.g = p.source_b
"""


def dsir_weights_sql(target_lang: str = "en", n_buckets: int = 4096) -> str:
    """Mirror of operators.dsir.dsir_weights: hashed-bigram importance
    log-weight toward the ``lang = target_lang`` subset, add-one smoothed
    over ``n_buckets`` buckets; the per-bucket log-ratio is rounded once
    to micro-nats (single double division of exact BIGINT products, so
    the ln argument is engine-identical)."""
    b = n_buckets
    bucket = _h48("toks[CAST(i AS INT)] || chr(31) || toks[CAST(i AS INT) + 1]")
    return f"""
WITH {TOKS_CTE},
bg AS MATERIALIZED (
  SELECT doc_id, {bucket} % {b} AS bucket
  FROM toks_t, UNNEST(range(1, len(toks))) AS t(i)),
pm AS MATERIALIZED (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS m
  FROM bg GROUP BY 1, 2),
bk AS MATERIALIZED (
  SELECT bucket,
         CAST(sum(CASE WHEN d.lang = '{target_lang}' THEN m ELSE 0 END)
              AS BIGINT) AS ct,
         CAST(sum(m) AS BIGINT) AS cr
  FROM pm JOIN documents d USING (doc_id) GROUP BY 1),
tot AS (SELECT CAST(COALESCE(sum(ct), 0) AS BIGINT) AS nt,
               CAST(COALESCE(sum(cr), 0) AS BIGINT) AS nr FROM bk),
model AS MATERIALIZED (
  SELECT bucket,
         CAST(round(1000000 * ln(CAST((ct + 1) * (nr + {b}) AS DOUBLE)
                                 / CAST((cr + 1) * (nt + {b}) AS DOUBLE)))
              AS BIGINT) AS lw
  FROM bk CROSS JOIN tot),
pd AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
              CAST(sum(m * lw) AS BIGINT) AS w
  FROM pm JOIN model USING (bucket) GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(w, 0) AS BIGINT) AS logweight_micros
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def sgc_features_sql(hops: int = 2) -> str:
    """Mirror of algos.features.smooth_features over the undirected
    distinct contact graph with per-user event-type count features:
    each hop is sum over neighbors ∪ self then the exact integer
    division by (deg + 1).  All values non-negative, so DuckDB's floor
    ``//`` and Spark's toward-zero ``div`` agree."""
    parts = [
        "ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events)",
        "ce AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst)",
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,\n"
        "  greatest(src, dst) AS b FROM ce)",
        "sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM und\n"
        "  UNION ALL SELECT b AS src, a AS dst FROM und)",
        "deg AS MATERIALIZED (SELECT src AS user_id,\n"
        "  CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1)",
        "f0 AS MATERIALIZED (SELECT user_id, event_type AS feature,\n"
        "  CAST(count(*) * 1000000 AS BIGINT) AS v FROM ev GROUP BY 1, 2)",
    ]
    for k in range(hops):
        parts.append(
            f"g{k} AS (SELECT user_id, feature, CAST(sum(v) AS BIGINT) AS s\n"
            f"  FROM (SELECT user_id, feature, v FROM f{k}\n"
            f"        UNION ALL\n"
            f"        SELECT s.dst AS user_id, f.feature, f.v\n"
            f"        FROM f{k} f JOIN sym s ON s.src = f.user_id)\n"
            f"  GROUP BY 1, 2)"
        )
        parts.append(
            f"f{k + 1} AS MATERIALIZED (SELECT g.user_id, g.feature,\n"
            f"  CAST(g.s // (COALESCE(d.deg, 0) + 1) AS BIGINT) AS v\n"
            f"  FROM g{k} g LEFT JOIN deg d USING (user_id))"
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT user_id, feature, v AS sgc_micros FROM f{hops}"
    )


def linkpred_auc_sql(max_wedge_degree: int = 100) -> str:
    """Mirror of algos.linkpred.linkpred_auc over the contact graph:
    midrank Mann-Whitney AUC of jaccard_micros separating actual edges
    from non-adjacent wedge pairs.  The 2U identity keeps every
    division over non-negative BIGINTs (// == Spark div)."""
    return f"""
WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,
  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
ce0 AS MATERIALIZED (SELECT src, dst FROM (
  SELECT lag(user_id) OVER (PARTITION BY event_type
           ORDER BY ts_us, event_id) AS src,
         user_id AS dst FROM ev)
  WHERE src IS NOT NULL AND src <> dst),
und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM ce0 UNION ALL SELECT dst AS src, src AS dst FROM ce0)
  WHERE src <> dst),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg
  FROM und GROUP BY 1),
ctr AS (SELECT src AS w FROM deg WHERE deg >= 2 AND deg <= {max_wedge_degree}),
pairs AS MATERIALIZED (
  SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM und e1 JOIN ctr c ON c.w = e1.src JOIN und e2 ON e2.src = e1.src
  WHERE e1.dst < e2.dst GROUP BY 1, 2),
scored AS (
  SELECT (1000000 * p.cn) // (du.deg + dv.deg - p.cn) AS score,
         CASE WHEN x.src IS NOT NULL THEN 1 ELSE 0 END AS pos
  FROM pairs p
  LEFT JOIN und x ON x.src = p.u AND x.dst = p.v
  JOIN deg du ON du.src = p.u JOIN deg dv ON dv.src = p.v),
sc AS (SELECT score, CAST(sum(pos) AS BIGINT) AS n_pos,
              CAST(count(*) AS BIGINT) AS n_all
  FROM scored GROUP BY 1),
ranked AS (SELECT score, n_pos, n_all,
  CAST(sum(n_all) OVER (ORDER BY score
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_all
       AS BIGINT) AS c_less
  FROM sc),
agg AS (SELECT CAST(sum(n_pos) AS BIGINT) AS p,
               CAST(sum(n_all - n_pos) AS BIGINT) AS n,
               CAST(sum(n_pos * (2 * c_less + n_all + 1)) AS BIGINT) AS s
  FROM ranked)
SELECT CAST(COALESCE(p, 0) AS BIGINT) AS n_pos,
  CAST(COALESCE(n, 0) AS BIGINT) AS n_neg,
  CAST(CASE WHEN p > 0 AND n > 0
       THEN (1000000 * (s - p * (p + 1))) // (2 * p * n) END AS BIGINT)
  AS auc_micros
FROM agg
"""


def contract_graph_sql(lpa_iterations: int = 3) -> str:
    """Mirror of algos.community.contract_graph over the LPA-N labels:
    both endpoints re-keyed to their community, multiplicities summed,
    intra-community rows kept."""
    it = lpa_iterations
    parts = _lpa_parts(it)
    body = (
        ", " + ",\n".join(parts) + "\n"
        "SELECT ls.label AS c_src, ld.label AS c_dst,\n"
        "       CAST(count(*) AS BIGINT) AS n_edges\n"
        f"FROM edges e JOIN l{it} ls ON ls.id = e.src\n"
        f"             JOIN l{it} ld ON ld.id = e.dst\n"
        "GROUP BY 1, 2"
    )
    return _graph_query(body)


def snapshot_delta_sql() -> str:
    """Mirror of operators.temporal.contact_edges + snapshot_delta:
    per-type contact chains, BIGINT midpoint split, per-src distinct-
    neighbor churn (DuckDB // == Spark div on non-negative ts)."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst, t FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst, ts_us AS t FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst),\n"
        "mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM ce),\n"
        "st AS (SELECT src, dst,\n"
        "  max(CASE WHEN t < mid THEN 1 ELSE 0 END) AS has_old,\n"
        "  max(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS has_new\n"
        "  FROM ce CROSS JOIN mid GROUP BY src, dst)\n"
        "SELECT src AS id,\n"
        "  CAST(sum(has_old * has_new) AS BIGINT) AS n_kept,\n"
        "  CAST(sum((1 - has_old) * has_new) AS BIGINT) AS n_added,\n"
        "  CAST(sum(has_old * (1 - has_new)) AS BIGINT) AS n_removed,\n"
        "  CAST(sum(has_old) AS BIGINT) AS deg_old,\n"
        "  CAST(sum(has_new) AS BIGINT) AS deg_new\n"
        "FROM st GROUP BY src"
    )


def dag_layers_sql(depth: int = 8) -> str:
    """Mirror of algos.dag.dag_layers: unrolled max-plus longest-path
    layering over the transcript DAG — ``depth`` delivery rounds, exactly
    the naive iterate the engine's send-on-update propagation equals
    (monotone max: a non-updating vertex has nothing new to send)."""
    parts = [
        "d0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS layer "
        "FROM vertices)"
    ]
    for k in range(1, depth + 1):
        prev = f"d{k - 1}"
        parts.append(
            f"d{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"    CAST(CASE WHEN m.d IS NOT NULL AND m.d > p.layer\n"
            f"         THEN m.d ELSE p.layer END AS BIGINT) AS layer\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, max(q.layer) + 1 AS d\n"
            f"    FROM edges e JOIN {prev} q ON q.id = e.src\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    joined = ",\n".join(parts)
    body = f", {joined}\nSELECT id, layer FROM d{depth}"
    return _graph_query(body)


def revenue_forecast_sql(
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    discount: float = 0.05,
    max_qty: int = 24,
) -> str:
    """Mirror of operators.relational.revenue_forecast (TPC-H Q6 shape):
    identical per-row micro-unit rounding, identical decimal literals in
    the discount band (same nearest-double on both engines)."""
    return (
        "SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * l_discount"
        " * 1000000, 0) AS BIGINT)), 0) AS BIGINT) AS revenue_micros\n"
        "FROM lineitem\n"
        f"WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"  AND l_shipdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        f"  AND l_discount >= {discount} - 0.01\n"
        f"  AND l_discount <= {discount} + 0.01\n"
        f"  AND l_quantity < {max_qty}"
    )


def entity_resolution_sql(max_df: int = 16) -> str:
    """Mirror of operators.entity.entity_resolution over the
    with_shared_contacts corpus: same suffix expressions (DuckDB // ==
    Spark div on non-negative ids), same PII-dialect extraction, same
    df-capped star edges, transitive closure via recursive reach."""
    email_pat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_pat = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    return (
        "WITH RECURSIVE src AS MATERIALIZED (SELECT doc_id,\n"
        "  text\n"
        "  || CASE WHEN doc_id % 3 = 0 THEN ' mail user'\n"
        "       || CAST(doc_id // 6 AS VARCHAR) || '@example.com'\n"
        "     ELSE '' END\n"
        "  || CASE WHEN doc_id % 5 = 0 THEN ' tel 415-555-'\n"
        "       || lpad(CAST((doc_id // 10) % 10000 AS VARCHAR), 4, '0')\n"
        "     ELSE '' END AS text\n"
        "  FROM documents),\n"
        "idents AS MATERIALIZED (SELECT DISTINCT doc_id, ident FROM (\n"
        "  SELECT doc_id, 'email:' || lower(x) AS ident FROM (\n"
        f"    SELECT doc_id, unnest(regexp_extract_all(text, '{email_pat}'))"
        " AS x FROM src)\n"
        "  UNION ALL\n"
        "  SELECT doc_id, 'phone:' || lower(x) AS ident FROM (\n"
        f"    SELECT doc_id, unnest(regexp_extract_all(text, '{phone_pat}'))"
        " AS x FROM src))),\n"
        "g AS MATERIALIZED (SELECT ident, min(doc_id) AS m, count(*) AS df\n"
        "  FROM idents GROUP BY ident),\n"
        "se AS MATERIALIZED (SELECT g.m AS s, i.doc_id AS d\n"
        "  FROM idents i JOIN g USING (ident)\n"
        f"  WHERE g.df BETWEEN 2 AND {max_df} AND i.doc_id <> g.m),\n"
        "du AS MATERIALIZED (SELECT s, d FROM se UNION SELECT d, s FROM se),\n"
        "reach(id, r) AS (\n"
        "  SELECT doc_id, doc_id FROM documents\n"
        "  UNION\n"
        "  SELECT u.d, reach.r FROM reach JOIN du u ON u.s = reach.id)\n"
        "SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS entity\n"
        "FROM reach GROUP BY id"
    )


_REV_M = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)"
)


def priority_late_orders_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1996-04-01"
) -> str:
    """Mirror of operators.relational.priority_late_orders (Q4 shape):
    EXISTS lineitem shipped after the order date, counted per priority."""
    return (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count\n"
        "FROM orders o\n"
        f"WHERE o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"  AND o_orderdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "  AND EXISTS (SELECT 1 FROM lineitem l\n"
        "    WHERE l.l_orderkey = o.o_orderkey"
        " AND l.l_shipdate > o.o_orderdate)\n"
        "GROUP BY o_orderpriority"
    )


def nation_pair_volume_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1998-01-01"
) -> str:
    """Mirror of operators.relational.nation_pair_volume (Q7 shape)."""
    return (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,\n"
        "  CAST(year(l_shipdate) AS BIGINT) AS l_year,\n"
        f"  CAST(sum({_REV_M}) AS BIGINT) AS revenue_micros\n"
        "FROM lineitem\n"
        "JOIN supplier ON s_suppkey = l_suppkey\n"
        "JOIN nation sn ON sn.n_nationkey = s_nationkey\n"
        "JOIN orders ON o_orderkey = l_orderkey\n"
        "JOIN customer ON c_custkey = o_custkey\n"
        "JOIN nation cn ON cn.n_nationkey = c_nationkey\n"
        f"WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"  AND l_shipdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "  AND sn.n_name <> cn.n_name\n"
        "GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"
    )


def returned_item_report_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1996-04-01", n: int = 20
) -> str:
    """Mirror of operators.relational.returned_item_report (Q10 shape)."""
    return (
        "SELECT c_custkey, c_name, n_name,\n"
        f"  CAST(sum({_REV_M}) AS BIGINT) AS revenue_micros,\n"
        "  CAST(max(CAST(round(c_acctbal * 1000000, 0) AS BIGINT))"
        " AS BIGINT) AS acctbal_micros\n"
        "FROM lineitem\n"
        "JOIN orders ON o_orderkey = l_orderkey\n"
        "JOIN customer ON c_custkey = o_custkey\n"
        "JOIN nation ON n_nationkey = c_nationkey\n"
        "WHERE l_returnflag = 'R'\n"
        f"  AND o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"  AND o_orderdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "GROUP BY c_custkey, c_name, n_name\n"
        f"ORDER BY revenue_micros DESC, c_custkey ASC LIMIT {n}"
    )


def customer_order_distribution_sql() -> str:
    """Mirror of operators.relational.customer_order_distribution (Q13
    shape): zero-order customers kept by the LEFT join."""
    return (
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (\n"
        "  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count\n"
        "  FROM customer LEFT JOIN orders ON o_custkey = c_custkey\n"
        "  GROUP BY c_custkey)\n"
        "GROUP BY c_count"
    )


def promo_revenue_effect_sql(
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-02-01",
    promo_type: str = "PROMO",
) -> str:
    """Mirror of operators.relational.promo_revenue_effect (Q14 shape):
    the percentage is the identical 128-bit integral quotient (HUGEINT
    here, DECIMAL(38,0) div on Spark), cast back to BIGINT."""
    return (
        "WITH a AS (SELECT\n"
        f"  CAST(COALESCE(sum(CASE WHEN p_type = '{promo_type}'"
        f" THEN {_REV_M} END), 0) AS BIGINT) AS promo_micros,\n"
        f"  CAST(COALESCE(sum({_REV_M}), 0) AS BIGINT) AS total_micros\n"
        "  FROM lineitem JOIN part ON p_partkey = l_partkey\n"
        f"  WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"    AND l_shipdate < TIMESTAMP '{date_hi} 00:00:00')\n"
        "SELECT promo_micros, total_micros,\n"
        "  CAST(CASE WHEN total_micros = 0 THEN 0 ELSE\n"
        "    (CAST(promo_micros AS HUGEINT) * 100000000) // total_micros\n"
        "  END AS BIGINT) AS promo_pct_micros\n"
        "FROM a"
    )


def top_supplier_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1996-04-01"
) -> str:
    """Mirror of operators.relational.top_supplier (Q15 shape): ties at
    the max all kept."""
    return (
        "WITH rev AS MATERIALIZED (\n"
        "  SELECT l_suppkey AS suppkey,\n"
        f"    CAST(sum({_REV_M}) AS BIGINT) AS total_revenue_micros\n"
        "  FROM lineitem\n"
        f"  WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"    AND l_shipdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "  GROUP BY l_suppkey)\n"
        "SELECT s_suppkey, s_name, total_revenue_micros\n"
        "FROM rev JOIN supplier ON s_suppkey = suppkey\n"
        "WHERE total_revenue_micros = (SELECT max(total_revenue_micros)"
        " FROM rev)"
    )


def large_volume_customers_sql(min_qty: int = 300) -> str:
    """Mirror of operators.relational.large_volume_customers (Q18
    shape)."""
    return (
        "WITH qty AS (\n"
        "  SELECT l_orderkey,\n"
        "    CAST(sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT))"
        " AS BIGINT) AS sum_qty_micros\n"
        "  FROM lineitem GROUP BY l_orderkey\n"
        f"  HAVING sum(CAST(round(l_quantity * 1000000, 0) AS BIGINT))"
        f" > {min_qty} * 1000000)\n"
        "SELECT c_custkey, c_name, o_orderkey, o_orderdate,\n"
        "  CAST(round(o_totalprice * 1000000, 0) AS BIGINT)"
        " AS totalprice_micros,\n"
        "  sum_qty_micros\n"
        "FROM qty JOIN orders ON o_orderkey = l_orderkey\n"
        "JOIN customer ON c_custkey = o_custkey"
    )


def market_share_sql(
    nation_name: str = "NATION_3",
    region_name: str = "ASIA",
    part_type: str = "ECONOMY",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> str:
    """Mirror of operators.relational.market_share (Q8 shape): the
    share is the identical 128-bit integral quotient (HUGEINT here,
    DECIMAL(38,0) div on Spark)."""
    return (
        "WITH a AS (\n"
        "  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,\n"
        f"    CAST(COALESCE(sum(CASE WHEN sn.n_name = '{nation_name}'"
        f" THEN {_REV_M} END), 0) AS BIGINT) AS nation_micros,\n"
        f"    CAST(sum({_REV_M}) AS BIGINT) AS total_micros\n"
        "  FROM lineitem\n"
        f"  JOIN part ON p_partkey = l_partkey AND p_type = '{part_type}'\n"
        "  JOIN orders ON o_orderkey = l_orderkey\n"
        f"    AND o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"    AND o_orderdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "  JOIN customer ON c_custkey = o_custkey\n"
        "  JOIN nation cn ON cn.n_nationkey = c_nationkey\n"
        "  JOIN region ON r_regionkey = cn.n_regionkey"
        f" AND r_name = '{region_name}'\n"
        "  JOIN supplier ON s_suppkey = l_suppkey\n"
        "  JOIN nation sn ON sn.n_nationkey = s_nationkey\n"
        "  GROUP BY year(o_orderdate))\n"
        "SELECT o_year, nation_micros, total_micros,\n"
        "  CAST(CASE WHEN total_micros = 0 THEN 0 ELSE\n"
        "    (CAST(nation_micros AS HUGEINT) * 1000000) // total_micros\n"
        "  END AS BIGINT) AS share_micros\n"
        "FROM a"
    )


_QTY_M = "CAST(round(l_quantity * 1000000, 0) AS BIGINT)"


def small_quantity_revenue_sql(
    brand: str = "Brand#11", frac_den: int = 5, years: int = 7
) -> str:
    """Mirror of operators.relational.small_quantity_revenue (Q17
    shape): the correlated avg is the same exact BIGINT cross-product
    test (qty_m * cnt * den < sum_qty_m)."""
    return (
        "WITH b AS MATERIALIZED (\n"
        f"  SELECT l_partkey, {_QTY_M} AS qty_m,\n"
        "    CAST(round(l_extendedprice * 1000000, 0) AS BIGINT)"
        " AS price_m\n"
        "  FROM lineitem JOIN part ON p_partkey = l_partkey"
        f" AND p_brand = '{brand}'),\n"
        "a AS (SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS cnt,\n"
        "    CAST(sum(qty_m) AS BIGINT) AS sum_qty_m\n"
        "  FROM b GROUP BY l_partkey),\n"
        "t AS (SELECT CAST(COALESCE(sum(price_m), 0) AS BIGINT)"
        " AS total_micros\n"
        "  FROM b JOIN a ON pk = l_partkey\n"
        f"  WHERE qty_m * cnt * {frac_den} < sum_qty_m)\n"
        "SELECT total_micros,\n"
        f"  CAST(CAST(total_micros AS HUGEINT) // {years} AS BIGINT)"
        " AS avg_yearly_micros\n"
        "FROM t"
    )


def disjunctive_revenue_sql(
    cases: tuple[tuple[str, int, int, int], ...] = (
        ("Brand#12", 15, 1, 11),
        ("Brand#21", 20, 10, 20),
        ("Brand#25", 25, 20, 30),
    ),
) -> str:
    """Mirror of operators.relational.disjunctive_revenue (Q19 shape)."""
    arms = "\n   OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {sz}"
        f" AND l_quantity BETWEEN {lo} AND {hi})"
        for b, sz, lo, hi in cases
    )
    return (
        f"SELECT CAST(COALESCE(sum({_REV_M}), 0) AS BIGINT)"
        " AS revenue_micros\n"
        "FROM lineitem JOIN part ON p_partkey = l_partkey\n"
        f"WHERE {arms}"
    )


def waiting_suppliers_sql(
    late_days: int = 30, status: str = "F", n: int = 20
) -> str:
    """Mirror of operators.relational.waiting_suppliers (Q21 shape):
    the same grouped rewrite of the double correlated EXISTS."""
    return (
        "WITH pp AS MATERIALIZED (\n"
        "  SELECT l_orderkey, l_suppkey,\n"
        "    bool_or(l_shipdate > o_orderdate"
        f" + INTERVAL {int(late_days)} DAY) AS late\n"
        "  FROM lineitem JOIN orders ON o_orderkey = l_orderkey\n"
        f"  WHERE o_orderstatus = '{status}'\n"
        "  GROUP BY l_orderkey, l_suppkey),\n"
        "po AS (SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT)"
        " AS n_supp,\n"
        "    CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_late\n"
        "  FROM pp GROUP BY l_orderkey)\n"
        "SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait\n"
        "FROM pp JOIN po ON ok = l_orderkey\n"
        "JOIN supplier ON s_suppkey = l_suppkey\n"
        "JOIN nation ON n_nationkey = s_nationkey\n"
        "WHERE late AND n_supp > 1 AND n_late = 1\n"
        "GROUP BY s_name, n_name\n"
        f"ORDER BY numwait DESC, s_name ASC LIMIT {n}"
    )


def dormant_customers_sql(
    cutoff: str = "1999-01-01",
    nation_keys: tuple[int, ...] = (0, 2, 4, 6, 8, 10, 12),
) -> str:
    """Mirror of operators.relational.dormant_customers (Q22 shape):
    the scalar avg is the same exact BIGINT cross-product test."""
    keys = ", ".join(str(k) for k in nation_keys)
    return (
        "WITH c AS MATERIALIZED (\n"
        "  SELECT c_custkey, c_nationkey,\n"
        "    CAST(round(c_acctbal * 1000000, 0) AS BIGINT) AS acctbal_m\n"
        f"  FROM customer WHERE c_nationkey IN ({keys})),\n"
        "s AS (SELECT CAST(COALESCE(sum(acctbal_m), 0) AS BIGINT)"
        " AS sum_m,\n"
        "    CAST(count(*) AS BIGINT) AS cnt\n"
        "  FROM c WHERE acctbal_m > 0)\n"
        "SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,\n"
        "  CAST(sum(acctbal_m) AS BIGINT) AS totacctbal_micros\n"
        "FROM c, s\n"
        "JOIN nation ON n_nationkey = c_nationkey\n"
        "WHERE acctbal_m * cnt > sum_m\n"
        "  AND NOT EXISTS (SELECT 1 FROM orders o\n"
        "    WHERE o.o_custkey = c.c_custkey\n"
        f"      AND o.o_orderdate >= TIMESTAMP '{cutoff} 00:00:00')\n"
        "GROUP BY n_name"
    )


def _ps_attr(tag: str, lo: int, span: int) -> str:
    h = _h48(
        f"concat_ws(chr(31), '{tag}', CAST(ps_partkey AS VARCHAR),"
        " CAST(ps_suppkey AS VARCHAR))"
    )
    return f"{h} % {span} + {lo}"


#: Mirror of operators.relational.derive_partsupp: 4 consecutive-residue
#: suppliers per part UNION the observed lineitem pairs, attributes
#: carved from the shared 48-bit md5 of the pair.
_PARTSUPP_CTE = (
    "partsupp AS MATERIALIZED (\n"
    "  SELECT ps_partkey, ps_suppkey,\n"
    f"    {_ps_attr('psav', 1, 9999)} AS ps_availqty,\n"
    f"    {_ps_attr('pscost', 1_000_000, 999_000_001)}"
    " AS ps_supplycost_micros\n"
    "  FROM (SELECT DISTINCT ps_partkey, ps_suppkey FROM (\n"
    "    SELECT p_partkey AS ps_partkey,\n"
    "      (p_partkey * 4 + i) % s_cnt AS ps_suppkey\n"
    "    FROM part\n"
    "    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS s_cnt"
    " FROM supplier)\n"
    "    CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i)\n"
    "    UNION ALL\n"
    "    SELECT l_partkey, CAST(l_suppkey AS BIGINT) FROM lineitem)))"
)


def derive_partsupp_sql() -> str:
    """The derived partsupp itself as a checkable result set."""
    return (
        f"WITH {_PARTSUPP_CTE}\n"
        "SELECT ps_partkey, ps_suppkey, ps_availqty,"
        " ps_supplycost_micros FROM partsupp"
    )


def min_cost_supplier_sql(
    region_name: str = "EUROPE",
    p_type: str = "ECONOMY",
    max_size: int = 25,
) -> str:
    """Mirror of operators.relational.min_cost_supplier (Q2 shape):
    the correlated min-cost subquery as a grouped min joined back."""
    return (
        f"WITH {_PARTSUPP_CTE},\n"
        "sup AS MATERIALIZED (\n"
        "  SELECT s_suppkey, s_name,\n"
        "    CAST(round(s_acctbal * 1000000, 0) AS BIGINT)"
        " AS acctbal_micros, n_name\n"
        "  FROM supplier JOIN nation ON n_nationkey = s_nationkey\n"
        "  JOIN region ON r_regionkey = n_regionkey\n"
        f"  WHERE r_name = '{region_name}'),\n"
        "ps AS MATERIALIZED (\n"
        "  SELECT ps_partkey, ps_suppkey, ps_supplycost_micros,\n"
        "    s_name, acctbal_micros, n_name, p_brand\n"
        "  FROM partsupp JOIN sup ON s_suppkey = ps_suppkey\n"
        "  JOIN part ON p_partkey = ps_partkey\n"
        f"  WHERE p_type = '{p_type}' AND p_size <= {max_size}),\n"
        "best AS (SELECT ps_partkey AS bk,"
        " min(ps_supplycost_micros) AS mc\n"
        "  FROM ps GROUP BY ps_partkey)\n"
        "SELECT acctbal_micros, s_name, n_name,\n"
        "  ps_partkey AS p_partkey, p_brand,\n"
        "  ps_suppkey AS s_suppkey,\n"
        "  ps_supplycost_micros AS supplycost_micros\n"
        "FROM ps JOIN best\n"
        "  ON ps_partkey = bk AND ps_supplycost_micros = mc"
    )


def product_type_profit_sql(name_contains: str = "red") -> str:
    """Mirror of operators.relational.product_type_profit (Q9 shape):
    revenue minus derived supplycost * quantity, exact micro-units."""
    return (
        f"WITH {_PARTSUPP_CTE}\n"
        "SELECT n_name AS nation,\n"
        "  CAST(year(o_orderdate) AS BIGINT) AS o_year,\n"
        f"  CAST(sum({_REV_M}\n"
        "      - ps_supplycost_micros * CAST(l_quantity AS BIGINT))"
        " AS BIGINT) AS profit_micros\n"
        "FROM lineitem\n"
        "JOIN part ON p_partkey = l_partkey\n"
        "JOIN partsupp ON ps_partkey = l_partkey"
        " AND ps_suppkey = l_suppkey\n"
        "JOIN supplier ON s_suppkey = l_suppkey\n"
        "JOIN nation ON n_nationkey = s_nationkey\n"
        "JOIN orders ON o_orderkey = l_orderkey\n"
        f"WHERE p_name LIKE '%{name_contains}%'\n"
        "GROUP BY n_name, year(o_orderdate)"
    )


def important_stock_sql(
    nation_name: str = "NATION_15", fraction_den: int = 500
) -> str:
    """Mirror of operators.relational.important_stock (Q11 shape):
    exact integer threshold — value > total // den."""
    return (
        f"WITH {_PARTSUPP_CTE},\n"
        "ps AS MATERIALIZED (\n"
        "  SELECT ps_partkey,"
        " ps_supplycost_micros * ps_availqty AS v\n"
        "  FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey\n"
        "  JOIN nation ON n_nationkey = s_nationkey\n"
        f"  WHERE n_name = '{nation_name}'),\n"
        "pp AS MATERIALIZED (\n"
        "  SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_micros\n"
        "  FROM ps GROUP BY ps_partkey),\n"
        "t AS (SELECT CAST(sum(value_micros) AS BIGINT)"
        " AS total FROM pp)\n"
        "SELECT ps_partkey, value_micros FROM pp, t\n"
        f"WHERE value_micros > total // {fraction_den}"
    )


def parts_supplier_counts_sql(
    excl_brand: str = "Brand#17",
    excl_type_prefix: str = "PROMO",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
) -> str:
    """Mirror of operators.relational.parts_supplier_counts (Q16
    shape): complaint suppliers (s_name LIKE '%7') anti-joined out."""
    size_list = ", ".join(str(s) for s in sizes)
    return (
        f"WITH {_PARTSUPP_CTE}\n"
        "SELECT p_brand, p_type, p_size,\n"
        "  CAST(count(DISTINCT ps_suppkey) AS BIGINT)"
        " AS supplier_cnt\n"
        "FROM partsupp JOIN part ON p_partkey = ps_partkey\n"
        f"WHERE p_brand <> '{excl_brand}'\n"
        f"  AND p_type NOT LIKE '{excl_type_prefix}%'\n"
        f"  AND p_size IN ({size_list})\n"
        "  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier\n"
        "    WHERE s_name LIKE '%7')\n"
        "GROUP BY p_brand, p_type, p_size"
    )


def potential_promotion_suppliers_sql(
    name_prefix: str = "red",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> str:
    """Mirror of operators.relational.potential_promotion_suppliers
    (Q20 shape): availqty > 2 * the pair's shipped quantity."""
    return (
        f"WITH {_PARTSUPP_CTE},\n"
        "pts AS MATERIALIZED (SELECT p_partkey FROM part\n"
        f"  WHERE p_name LIKE '{name_prefix}%'),\n"
        "shipped AS MATERIALIZED (\n"
        "  SELECT l_partkey, l_suppkey,\n"
        "    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty\n"
        "  FROM lineitem JOIN pts ON p_partkey = l_partkey\n"
        f"  WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"    AND l_shipdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "  GROUP BY l_partkey, l_suppkey),\n"
        "ex AS (SELECT DISTINCT ps_suppkey\n"
        "  FROM partsupp JOIN pts ON p_partkey = ps_partkey\n"
        "  JOIN shipped ON l_partkey = ps_partkey"
        " AND l_suppkey = ps_suppkey\n"
        "  WHERE ps_availqty > 2 * qty)\n"
        "SELECT s_suppkey, s_name, n_name\n"
        "FROM ex JOIN supplier ON s_suppkey = ps_suppkey\n"
        "JOIN nation ON n_nationkey = s_nationkey"
    )


def returnflag_priority_counts_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1997-01-01"
) -> str:
    """Mirror of operators.relational.returnflag_priority_counts (Q12
    shape): two-way conditional count per lineitem category."""
    high = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return (
        "SELECT l_returnflag,\n"
        f"  CAST(sum(CASE WHEN {high} THEN 1 ELSE 0 END) AS BIGINT)"
        " AS high_line_count,\n"
        f"  CAST(sum(CASE WHEN {high} THEN 0 ELSE 1 END) AS BIGINT)"
        " AS low_line_count\n"
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey\n"
        f"WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'\n"
        f"  AND l_shipdate < TIMESTAMP '{date_hi} 00:00:00'\n"
        "GROUP BY l_returnflag"
    )


def response_latency_sql(percents: tuple[int, ...] = (50, 90, 99)) -> str:
    """Mirror of operators.analytics.response_latency_quantiles: one
    lead window over (conv_id, turn_idx), then the grouped_quantiles
    rank rule per role transition; gaps in BIGINT epoch micros."""
    picks = ",\n".join(
        f"  round(max(CASE WHEN rn = (n.n * {pct} + 99) // 100 "
        f"THEN gap_us END), 6) AS p{pct}"
        for pct in percents
    )
    body = (
        ", pairs AS MATERIALIZED (\n"
        "  SELECT role || ' > ' || lead(role) OVER w AS transition,\n"
        "    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us,\n"
        "    lead(role) OVER w AS next_role\n"
        "  FROM transcripts\n"
        "  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),\n"
        "src AS MATERIALIZED (\n"
        "  SELECT transition, gap_us FROM pairs\n"
        "  WHERE next_role IS NOT NULL AND gap_us IS NOT NULL),\n"
        "r AS MATERIALIZED (\n"
        "  SELECT transition, gap_us,\n"
        "    row_number() OVER (PARTITION BY transition ORDER BY gap_us)"
        " AS rn\n"
        "  FROM src),\n"
        "n AS (SELECT transition, count(*) AS n FROM src"
        " GROUP BY transition)\n"
        "SELECT r.transition, CAST(max(n.n) AS BIGINT) AS n,\n"
        f"{picks}\n"
        "FROM r JOIN n USING (transition)\n"
        "GROUP BY r.transition"
    )
    return _graph_query(body)


def edit_distance_join_sql(k: int = 8) -> str:
    """Oracle for operators.dedup.edit_distance_join: brute-force every
    length-banded pair with exact levenshtein — deliberately NOT the
    prefix filter, so a green row proves the filter's COMPLETENESS
    (the jaccard_join_exact discipline)."""
    return (
        "SELECT a.doc_id AS a, b.doc_id AS b,\n"
        "  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist\n"
        "FROM documents a JOIN documents b\n"
        "  ON a.doc_id < b.doc_id\n"
        f" AND abs(length(a.text) - length(b.text)) <= {k}\n"
        f"WHERE levenshtein(a.text, b.text) <= {k}"
    )


def random_projection_sql(out_dim: int = 16) -> str:
    """Mirror of operators.similarity.random_projection: the relational
    formulation (parallel-unnest the coordinates with a scalar range()
    index list, cross the output dims, sum per (vec_id, j)) of the
    identical integer arithmetic — micro-quantized coordinates times
    the LCG-parity Rademacher sign."""
    return (
        "WITH xs AS MATERIALIZED (\n"
        "  SELECT vec_id, unnest(embedding) AS x,\n"
        "    unnest(range(1, len(embedding) + 1)) AS i\n"
        "  FROM embeddings)\n"
        "SELECT xs.vec_id, CAST(j.range AS INT) AS dim,\n"
        "  CAST(SUM(\n"
        "    CAST(round(CAST(xs.x AS DOUBLE) * 1000000, 0) AS BIGINT)\n"
        "    * (1 - 2 * ((((xs.i - 1) * 1103515245 + j.range * 12345)"
        " // 65536) % 2))\n"
        "  ) AS BIGINT) AS value_micros\n"
        f"FROM xs, range(0, {out_dim}) j\n"
        "GROUP BY xs.vec_id, j.range"
    )


def kmeans_elbow_sql(
    ks: tuple = (2, 4, 8), iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.kmeans_elbow: one independent
    _kmeans_ctes chain per candidate k (identical seeds, distances,
    tie-breaks, truncating centroid division), each reduced to its
    1-row (k, n_vectors, inertia) via the rn = 1 assignment."""
    parts: list[str] = []
    finals = []
    for k in ks:
        sfx = f"_e{k}"
        parts.extend(_kmeans_ctes(int(k), iterations, d, sfx=sfx))
        finals.append(
            f"SELECT CAST({k} AS BIGINT) AS k,\n"
            f"  CAST(count(*) AS BIGINT) AS n_vectors,\n"
            f"  CAST(SUM(d2) AS BIGINT) AS inertia FROM (\n"
            f"  SELECT q.vec_id,\n"
            f"    sum((q.qv - c.cv) * (q.qv - c.cv)) AS d2,\n"
            f"    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
            f"      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
            f"  FROM qe{sfx} q JOIN cent{iterations}{sfx} c"
            f" ON c.pos = q.pos\n"
            f"  GROUP BY q.vec_id, c.cl) WHERE rn = 1"
        )
    joined = ",\n".join(parts)
    union = "\nUNION ALL\n".join(finals)
    return f"WITH {joined}\n{union}"


def error_rate_by_activity_sql(
    error_type: str = "error",
    unit_col: str = "user_id",
    type_col: str = "event_type",
) -> str:
    """Mirror of operators.analytics.error_rate_by_activity: the same
    length(bin(n)) magnitude bucket (renders identically in both
    engines) and exact-ratio shares."""
    et = error_type.replace("'", "''")
    return (
        "WITH er_p AS MATERIALIZED (\n"
        f"  SELECT {unit_col} AS u, CAST(count(*) AS BIGINT) AS n,\n"
        f"    CAST(SUM(CASE WHEN {type_col} = '{et}' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS errs\n"
        "  FROM events GROUP BY 1),\n"
        "er_b AS MATERIALIZED (\n"
        "  SELECT CAST(length(bin(n)) AS BIGINT) AS bucket,\n"
        "    CAST(count(*) AS BIGINT) AS n_units,\n"
        "    CAST(SUM(n) AS BIGINT) AS n_events,\n"
        "    CAST(SUM(errs) AS BIGINT) AS n_errors\n"
        "  FROM er_p GROUP BY 1)\n"
        "SELECT bucket, n_units, n_events, n_errors,\n"
        "  CAST((1000000 * n_errors - (1000000 * n_errors) % n_events)"
        " // n_events AS BIGINT) AS error_micros\n"
        "FROM er_b"
    )


def random_failure_tolerance_sql(remove_k: int = 10) -> str:
    """Mirror of algos.components.random_failure_tolerance: the
    (hash48(id) ASC, id ASC) k-victim pick over VERTICES (no degree
    pass), the surviving subgraph's recursive min-label CC, the
    exact-ratio giant fraction of the ORIGINAL vertex count.  The reach
    closure tolerates the WITH RECURSIVE UNION-dedup quirk (no counting
    over und here)."""
    h = _h48("CAST(id AS VARCHAR)")
    body = (
        ", rf_vic AS MATERIALIZED (SELECT id FROM (\n"
        f"  SELECT id, row_number() OVER (ORDER BY {h} ASC, id ASC)"
        " AS rn FROM vertices)\n"
        f"  WHERE rn <= {remove_k}),\n"
        "rf_vf AS MATERIALIZED (SELECT id FROM vertices\n"
        "  WHERE id NOT IN (SELECT id FROM rf_vic)),\n"
        "rf_ef AS MATERIALIZED (SELECT src, dst FROM und\n"
        "  WHERE src NOT IN (SELECT id FROM rf_vic)\n"
        "    AND dst NOT IN (SELECT id FROM rf_vic)),\n"
        "rf_reach(id, r) AS (\n"
        "  SELECT id, id FROM rf_vf\n"
        "  UNION\n"
        "  SELECT u.dst, rf_reach.r FROM rf_reach"
        " JOIN rf_ef u ON u.src = rf_reach.id),\n"
        "rf_comp AS (SELECT id, min(r) AS component"
        " FROM rf_reach GROUP BY id),\n"
        "rf_g AS (SELECT CAST(COALESCE(max(cnt), 0) AS BIGINT) AS giant\n"
        "  FROM (SELECT count(*) AS cnt FROM rf_comp GROUP BY component)),\n"
        "rf_nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM rf_vic),\n"
        "rf_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vertices)\n"
        "SELECT nv AS removed, n AS n_vertices, giant AS giant_size,\n"
        "  CAST((1000000 * giant - (1000000 * giant) % n) // n"
        " AS BIGINT) AS giant_micros\n"
        "FROM rf_g, rf_n, rf_nv"
    )
    return _graph_query(body, recursive=True)


def clustering_by_degree_sql() -> str:
    """Mirror of algos.triangles.clustering_by_degree: per-vertex
    triangles + undirected degree, exact micro cc per vertex, the
    length(bin(degree)) magnitude bucket, exact-ratio bucket average."""
    body = (
        f", {_TRI_CTES},\n"
        "cbd_tpv AS MATERIALIZED (\n"
        "  SELECT v.id, CAST(count(x.v) AS BIGINT) AS t\n"
        "  FROM vertices v LEFT JOIN (\n"
        "    SELECT unnest([v1, v2, v3]) AS v FROM tri) x ON x.v = v.id\n"
        "  GROUP BY v.id),\n"
        "cbd_deg AS MATERIALIZED (\n"
        "  SELECT src AS id, CAST(count(*) AS BIGINT) AS degree\n"
        "  FROM und GROUP BY src),\n"
        "cbd_per AS MATERIALIZED (\n"
        "  SELECT p.id, COALESCE(d.degree, 0) AS degree, p.t,\n"
        "    CASE WHEN COALESCE(d.degree, 0) >= 2\n"
        "      THEN (2000000 * p.t - (2000000 * p.t)"
        " % (d.degree * (d.degree - 1)))\n"
        "        // (d.degree * (d.degree - 1))\n"
        "      ELSE 0 END AS cc\n"
        "  FROM cbd_tpv p LEFT JOIN cbd_deg d ON d.id = p.id),\n"
        "cbd_b AS MATERIALIZED (\n"
        "  SELECT CAST(length(bin(degree)) AS BIGINT) AS bucket,\n"
        "    CAST(count(*) AS BIGINT) AS n_vertices,\n"
        "    CAST(SUM(t) AS BIGINT) AS n_triangles,\n"
        "    CAST(SUM(cc) AS BIGINT) AS s\n"
        "  FROM cbd_per GROUP BY 1)\n"
        "SELECT bucket, n_vertices, n_triangles,\n"
        "  CAST((s - s % n_vertices) // n_vertices AS BIGINT)"
        " AS avg_cc_micros\n"
        "FROM cbd_b"
    )
    return _graph_query(body)


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Mirror of operators.tfidf.bm25_topk: query-term filter BEFORE the
    tf aggregate, Robertson idf with the +1 floor rounded once to BIGINT
    micros, the per-(doc,term) score as ONE identically-structured
    double expression (constants rendered from the same Python doubles
    via repr), exact BIGINT per-doc sum, (score DESC, doc_id ASC) top-k.
    N and avgdl ride 1-row CTEs — the same integer values Spark folds in
    as literals, so the double arithmetic is bit-identical."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    k1p1, c0, c1 = k1 + 1.0, k1 * (1.0 - b), k1 * b
    return (
        f"WITH {TOKS_CTE},\n"
        "bm_dl AS MATERIALIZED (SELECT doc_id,"
        " CAST(len(toks) AS BIGINT) AS dl FROM toks_t),\n"
        "bm_n AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(SUM(dl) AS BIGINT) AS tot FROM bm_dl),\n"
        "bm_tf AS MATERIALIZED (\n"
        "  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (\n"
        "    SELECT doc_id, unnest(toks) AS term FROM toks_t)\n"
        f"  WHERE term IN ({terms}) GROUP BY doc_id, term),\n"
        "bm_df AS MATERIALIZED (SELECT term,"
        " CAST(count(*) AS BIGINT) AS df FROM bm_tf GROUP BY term),\n"
        "bm_idf AS MATERIALIZED (\n"
        "  SELECT term, CAST(round(1000000.0 *\n"
        "    ln((n - df + 0.5) / (df + 0.5) + 1.0)) AS BIGINT)"
        " AS idf_micros\n"
        "  FROM bm_df, bm_n),\n"
        "bm_s AS MATERIALIZED (\n"
        "  SELECT f.doc_id,\n"
        "    CAST(round(CAST(i.idf_micros * f.tf AS DOUBLE)"
        f" * {k1p1!r}\n"
        f"      / (CAST(f.tf AS DOUBLE) + {c0!r}"
        f" + {c1!r} * ((d.dl * n.n) / n.tot))) AS BIGINT) AS sm\n"
        "  FROM bm_tf f JOIN bm_idf i USING (term)\n"
        "  JOIN bm_dl d ON d.doc_id = f.doc_id, bm_n n)\n"
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,\n"
        "  CAST(SUM(sm) AS BIGINT) AS score_micros\n"
        "FROM bm_s GROUP BY doc_id\n"
        f"ORDER BY score_micros DESC, doc_id ASC LIMIT {k}"
    )


def mutual_information_sql(
    table: str = "documents",
    col_x: str = "source",
    col_y: str = "lang",
) -> str:
    """Mirror of operators.analytics.mutual_information: exact joint and
    marginal counts, the identically-structured ln-ratio and scaled-
    contribution expressions, micros rounding.  N rides a 1-row CTE —
    the same integer Spark folds in as a literal."""
    return (
        "WITH mi_j AS MATERIALIZED (\n"
        f"  SELECT {col_x} AS x, {col_y} AS y,"
        " CAST(count(*) AS BIGINT) AS n\n"
        f"  FROM {table} GROUP BY 1, 2),\n"
        "mi_x AS MATERIALIZED (SELECT x, CAST(SUM(n) AS BIGINT) AS nx"
        " FROM mi_j GROUP BY x),\n"
        "mi_y AS MATERIALIZED (SELECT y, CAST(SUM(n) AS BIGINT) AS ny"
        " FROM mi_j GROUP BY y),\n"
        "mi_n AS MATERIALIZED (SELECT CAST(SUM(n) AS BIGINT) AS nt"
        " FROM mi_j)\n"
        "SELECT j.x, j.y, j.n,\n"
        "  CAST(round(1000000.0 * ln((j.n * t.nt) / (x.nx * y.ny)))"
        " AS BIGINT) AS pmi_micros,\n"
        "  CAST(round(1000000.0 * j.n * ln((j.n * t.nt) / (x.nx * y.ny))"
        " / t.nt) AS BIGINT) AS mi_contrib_micros\n"
        "FROM mi_j j JOIN mi_x x USING (x) JOIN mi_y y USING (y), mi_n t"
    )


def triadic_closure_sql() -> str:
    """Mirror of operators.temporal.contact_edges + triadic_closure_rate:
    the per-type contact chains, BIGINT midpoint split, distinct-pair
    old/new sets, common-neighbor existence over the old graph (the
    oracle probes both endpoints — orientation is a Spark-side
    performance device, not a semantic one), exact-ratio closure."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst, t FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst, ts_us AS t FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst),\n"
        "mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM ce),\n"
        "tp AS MATERIALIZED (SELECT least(src, dst) AS lo,\n"
        "  greatest(src, dst) AS hi,\n"
        "  max(CASE WHEN t < mid THEN 1 ELSE 0 END) AS has_old,\n"
        "  max(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS has_new\n"
        "  FROM ce CROSS JOIN mid GROUP BY 1, 2),\n"
        "tc_old AS MATERIALIZED (SELECT lo, hi FROM tp WHERE has_old = 1),\n"
        "tc_add AS MATERIALIZED (SELECT lo, hi FROM tp\n"
        "  WHERE has_old = 0 AND has_new = 1),\n"
        "tc_adj AS MATERIALIZED (SELECT lo AS a, hi AS b FROM tc_old\n"
        "  UNION ALL SELECT hi, lo FROM tc_old),\n"
        "tc_close AS MATERIALIZED (\n"
        "  SELECT DISTINCT ad.lo, ad.hi FROM tc_add ad\n"
        "  JOIN tc_adj w1 ON w1.a = ad.lo\n"
        "  JOIN tc_adj w2 ON w2.a = ad.hi AND w2.b = w1.b\n"
        "  WHERE w1.b <> ad.hi AND w1.b <> ad.lo),\n"
        "tc_na AS (SELECT CAST(count(*) AS BIGINT) AS n_added FROM tc_add),\n"
        "tc_nc AS (SELECT CAST(count(*) AS BIGINT) AS n_closing"
        " FROM tc_close)\n"
        "SELECT n_added, n_closing,\n"
        "  CAST(CASE WHEN n_added = 0 THEN 0 ELSE\n"
        "    (1000000 * n_closing - (1000000 * n_closing) % n_added)"
        " // n_added END AS BIGINT) AS closure_micros\n"
        "FROM tc_na, tc_nc"
    )


def lexicon_flag_rate_sql(
    lexicon: list[str],
    group_col: str = "source",
) -> str:
    """Mirror of operators.profiling.lexicon_flag_rate: the same
    lower-cased lexicon as a list literal, per-doc occurrence counts
    via list_filter, one grouped aggregate, exact-ratio flag share."""
    lex = "[" + ", ".join(
        "'" + w.lower().replace("'", "''") + "'" for w in lexicon
    ) + "]"
    return (
        f"WITH {TOKS_CTE},\n"
        "lx_d AS MATERIALIZED (\n"
        f"  SELECT d.{group_col},\n"
        f"    CAST(len(list_filter(t.toks, x -> list_contains({lex}, x)))"
        " AS BIGINT) AS hits\n"
        "  FROM documents d JOIN toks_t t ON t.doc_id = d.doc_id)\n"
        f"SELECT {group_col},\n"
        "  CAST(count(*) AS BIGINT) AS n_docs,\n"
        "  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_flagged,\n"
        "  CAST(SUM(hits) AS BIGINT) AS n_hits,\n"
        "  CAST((1000000 * SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END)\n"
        "    - (1000000 * SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END))\n"
        "    % count(*)) // count(*) AS BIGINT) AS flag_micros\n"
        f"FROM lx_d GROUP BY {group_col}"
    )


def graph_hygiene_sql() -> str:
    """Mirror of algos.stats.graph_hygiene over the derived transcript
    graph: exact arc/self-loop/distinct counts, anti-join isolated and
    dangling counts, assembled from 1-row CTEs."""
    body = (
        ", gh_e AS MATERIALIZED (\n"
        "  SELECT CAST(count(*) AS BIGINT) AS n_arcs,\n"
        "    CAST(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_self_loops,\n"
        "    CAST(count(DISTINCT (src, dst)) AS BIGINT)"
        " AS n_distinct_arcs\n"
        "  FROM edges),\n"
        "gh_ends AS MATERIALIZED (\n"
        "  SELECT DISTINCT id FROM (\n"
        "    SELECT src AS id FROM edges UNION ALL"
        " SELECT dst AS id FROM edges)),\n"
        "gh_nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices"
        " FROM vertices),\n"
        "gh_iso AS (SELECT CAST(count(*) AS BIGINT) AS n_isolated\n"
        "  FROM vertices v WHERE NOT EXISTS\n"
        "    (SELECT 1 FROM gh_ends e WHERE e.id = v.id)),\n"
        "gh_dang AS (SELECT CAST(count(*) AS BIGINT) AS n_dangling\n"
        "  FROM gh_ends e WHERE NOT EXISTS\n"
        "    (SELECT 1 FROM vertices v WHERE v.id = e.id))\n"
        "SELECT n_vertices, n_arcs, n_self_loops,\n"
        "  CAST(n_arcs - n_distinct_arcs AS BIGINT) AS n_parallel_arcs,\n"
        "  n_isolated, n_dangling\n"
        "FROM gh_nv, gh_e, gh_iso, gh_dang"
    )
    return _graph_query(body)


def degree_mixing_matrix_sql() -> str:
    """Mirror of algos.stats.degree_mixing_matrix: the distinct
    undirected pair set, the same und-based degree count, the same
    length(bin()) buckets and unordered bucket pair."""
    body = (
        ", dm_p AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS lo,\n"
        "    greatest(src, dst) AS hi FROM edges WHERE src <> dst),\n"
        "dm_d AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d\n"
        "  FROM (SELECT lo AS v FROM dm_p UNION ALL"
        " SELECT hi AS v FROM dm_p)\n"
        "  GROUP BY v),\n"
        "dm_b AS MATERIALIZED (\n"
        "  SELECT CAST(length(bin(a.d)) AS BIGINT) AS blo,\n"
        "    CAST(length(bin(b.d)) AS BIGINT) AS bhi\n"
        "  FROM dm_p p JOIN dm_d a ON a.v = p.lo"
        " JOIN dm_d b ON b.v = p.hi)\n"
        "SELECT least(blo, bhi) AS bucket_a,"
        " greatest(blo, bhi) AS bucket_b,\n"
        "  CAST(count(*) AS BIGINT) AS n_edges\n"
        "FROM dm_b GROUP BY 1, 2"
    )
    return _graph_query(body)


def intercontact_histogram_sql() -> str:
    """Mirror of operators.temporal.contact_edges + intercontact_histogram:
    per-type contact chains, per-pair lag gaps, length(bin(gap))
    magnitude buckets, one grouped aggregate with a distinct-pair
    count."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst, t FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst, ts_us AS t FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst),\n"
        "ic_g AS MATERIALIZED (SELECT lo, hi,\n"
        "    CAST(t - prev AS BIGINT) AS gap FROM (\n"
        "  SELECT least(src, dst) AS lo, greatest(src, dst) AS hi, t,\n"
        "    lag(t) OVER (PARTITION BY least(src, dst), greatest(src, dst)\n"
        "                 ORDER BY t) AS prev\n"
        "  FROM ce) WHERE prev IS NOT NULL)\n"
        "SELECT CAST(length(bin(gap)) AS BIGINT) AS bucket,\n"
        "  CAST(count(*) AS BIGINT) AS n_gaps,\n"
        "  CAST(count(DISTINCT (lo, hi)) AS BIGINT) AS n_pairs\n"
        "FROM ic_g GROUP BY 1"
    )


def corpus_concentration_sql(group_col: str = "source") -> str:
    """Mirror of operators.profiling.corpus_concentration: per-source
    token mass, exact Σn² and max, the two exact-ratio micro shares."""
    return (
        f"WITH {TOKS_CTE},\n"
        "cc_p AS MATERIALIZED (\n"
        f"  SELECT d.{group_col}, CAST(SUM(len(t.toks)) AS BIGINT) AS n\n"
        "  FROM documents d JOIN toks_t t ON t.doc_id = d.doc_id\n"
        f"  GROUP BY d.{group_col}),\n"
        "cc_a AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,\n"
        "  CAST(SUM(n) AS BIGINT) AS total_tokens,\n"
        "  CAST(SUM(n * n) AS BIGINT) AS ssq,\n"
        "  CAST(MAX(n) AS BIGINT) AS top_n FROM cc_p)\n"
        "SELECT n_sources, total_tokens,\n"
        "  CAST((1000000 * ssq - (1000000 * ssq)"
        " % (total_tokens * total_tokens))\n"
        "    // (total_tokens * total_tokens) AS BIGINT) AS hhi_micros,\n"
        "  CAST((1000000 * top_n - (1000000 * top_n) % total_tokens)"
        " // total_tokens AS BIGINT) AS top_share_micros\n"
        "FROM cc_a"
    )


def boilerplate_coverage_sql(permille: int = 200) -> str:
    """Mirror of operators.dedup.boilerplate_coverage: per-source
    distinct 3-gram shingles, the integer df·1000 ≥ n_docs·permille
    threshold, exact per-doc coverage micros (shingle-less docs = 0),
    exact per-source mean."""
    return (
        f"WITH {TOKS_CTE},\n"
        "bp_sh AS MATERIALIZED (\n"
        "  SELECT d.source AS g, t.doc_id AS d, unnest(list_distinct(\n"
        "    CASE WHEN len(t.toks) >= 3 THEN\n"
        "      list_transform(range(len(t.toks) - 2),\n"
        "                     i -> array_to_string(t.toks[i + 1 : i + 3],"
        " ' '))\n"
        "    ELSE CAST([] AS VARCHAR[]) END)) AS shingle\n"
        "  FROM toks_t t JOIN documents d ON d.doc_id = t.doc_id),\n"
        "bp_nd AS MATERIALIZED (SELECT source AS g,\n"
        "  CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),\n"
        "bp_df AS MATERIALIZED (SELECT g, shingle,\n"
        "  CAST(count(*) AS BIGINT) AS df FROM bp_sh GROUP BY 1, 2),\n"
        "bp_b AS MATERIALIZED (SELECT f.g, f.shingle FROM bp_df f\n"
        f"  JOIN bp_nd n ON n.g = f.g"
        f" WHERE f.df * 1000 >= n.n_docs * {permille}),\n"
        "bp_tot AS MATERIALIZED (SELECT g, d,\n"
        "  CAST(count(*) AS BIGINT) AS n_sh FROM bp_sh GROUP BY 1, 2),\n"
        "bp_bo AS MATERIALIZED (SELECT s.g, s.d,\n"
        "  CAST(count(*) AS BIGINT) AS n_b FROM bp_sh s\n"
        "  WHERE EXISTS (SELECT 1 FROM bp_b b\n"
        "    WHERE b.g = s.g AND b.shingle = s.shingle)\n"
        "  GROUP BY 1, 2),\n"
        "bp_per AS MATERIALIZED (\n"
        "  SELECT dd.source AS g,\n"
        "    CASE WHEN COALESCE(t.n_sh, 0) > 0 THEN\n"
        "      (1000000 * COALESCE(b.n_b, 0)\n"
        "       - (1000000 * COALESCE(b.n_b, 0)) % t.n_sh) // t.n_sh\n"
        "    ELSE 0 END AS cov\n"
        "  FROM documents dd\n"
        "  LEFT JOIN bp_tot t ON t.g = dd.source AND t.d = dd.doc_id\n"
        "  LEFT JOIN bp_bo b ON b.g = dd.source AND b.d = dd.doc_id),\n"
        "bp_nb AS (SELECT g, CAST(count(*) AS BIGINT) AS n_boiler\n"
        "  FROM bp_b GROUP BY g),\n"
        "bp_out AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs,\n"
        "  CAST(SUM(cov) AS BIGINT) AS s FROM bp_per GROUP BY g)\n"
        "SELECT o.g AS source, o.n_docs,\n"
        "  CAST(COALESCE(nb.n_boiler, 0) AS BIGINT) AS n_boiler_shingles,\n"
        "  CAST((o.s - o.s % o.n_docs) // o.n_docs AS BIGINT)"
        " AS mean_coverage_micros\n"
        "FROM bp_out o LEFT JOIN bp_nb nb ON nb.g = o.g"
    )


def robustness_curve_sql(ks: list[int]) -> str:
    """Mirror of the robustness-curve entry query: the attack and
    random-failure tolerance oracles at each removal budget, stacked
    with a mode column (each arm is the already-proven standalone
    query, embedded as a subquery — DuckDB permits a full WITH
    RECURSIVE inside the parentheses)."""
    parts = []
    for k in ks:
        parts.append(
            f"SELECT 'attack' AS mode, a{k}.* FROM (\n"
            + attack_tolerance_sql(k)
            + f"\n) a{k}"
        )
        parts.append(
            f"SELECT 'failure' AS mode, f{k}.* FROM (\n"
            + random_failure_tolerance_sql(k)
            + f"\n) f{k}"
        )
    return "\nUNION ALL\n".join(parts)


def _contact_tolerance_sql(mode: str, remove_k: int) -> str:
    """One arm of the contact-graph robustness curve: attack (top-k
    undirected degree) or failure (hash48 rank) removal over the USER
    contact graph, then the recursive min-label CC giant.  Same
    RECURSIVE-safe discipline as attack_tolerance_sql: every counted
    set is built with explicit SELECT DISTINCT (never UNION-dedup)."""
    if mode == "attack":
        pick = (
            "ct_pick AS (SELECT id FROM (\n"
            "  SELECT src AS id, row_number() OVER (ORDER BY d DESC,"
            " src ASC) AS rn FROM (\n"
            "    SELECT src, count(*) AS d FROM\n"
            "      (SELECT DISTINCT src, dst FROM ct_und) GROUP BY src))\n"
            f"  WHERE rn <= {remove_k}),\n"
        )
    else:
        h = _h48("CAST(id AS VARCHAR)")
        pick = (
            "ct_pick AS (SELECT id FROM (\n"
            f"  SELECT id, row_number() OVER (ORDER BY {h} ASC, id ASC)"
            " AS rn FROM ct_v)\n"
            f"  WHERE rn <= {remove_k}),\n"
        )
    return (
        "WITH RECURSIVE ev AS MATERIALIZED (SELECT event_id, user_id,"
        " event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src, user_id AS dst\n"
        "  FROM ev) WHERE src IS NOT NULL AND src <> dst),\n"
        "ct_v AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),\n"
        "ct_und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce)),\n"
        + pick
        + "ct_vf AS MATERIALIZED (SELECT id FROM ct_v\n"
        "  WHERE id NOT IN (SELECT id FROM ct_pick)),\n"
        "ct_ef AS MATERIALIZED (SELECT src, dst FROM ct_und\n"
        "  WHERE src NOT IN (SELECT id FROM ct_pick)\n"
        "    AND dst NOT IN (SELECT id FROM ct_pick)),\n"
        "ct_reach(id, r) AS (\n"
        "  SELECT id, id FROM ct_vf\n"
        "  UNION\n"
        "  SELECT u.dst, ct_reach.r FROM ct_reach"
        " JOIN ct_ef u ON u.src = ct_reach.id),\n"
        "ct_comp AS (SELECT id, min(r) AS component"
        " FROM ct_reach GROUP BY id),\n"
        "ct_g AS (SELECT CAST(COALESCE(max(cnt), 0) AS BIGINT) AS giant\n"
        "  FROM (SELECT count(*) AS cnt FROM ct_comp GROUP BY component)),\n"
        "ct_nr AS (SELECT CAST(count(*) AS BIGINT) AS nr FROM ct_pick),\n"
        "ct_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ct_v)\n"
        f"SELECT '{mode}' AS mode, nr AS removed, n AS n_vertices,\n"
        "  giant AS giant_size,\n"
        "  CAST((1000000 * giant - (1000000 * giant) % n) // n"
        " AS BIGINT) AS giant_micros\n"
        "FROM ct_g, ct_n, ct_nr"
    )


def contact_robustness_sql(ks: list[int]) -> str:
    """Mirror of the contact-graph robustness entry query: both removal
    modes at each budget, stacked."""
    parts = []
    for k in ks:
        for mode in ("attack", "failure"):
            parts.append(
                f"SELECT * FROM (\n{_contact_tolerance_sql(mode, k)}\n)"
                f" c_{mode}_{k}"
            )
    return "\nUNION ALL\n".join(parts)


def cross_source_duplication_sql(
    group_col: str = "source",
    prefix_tokens: int | None = None,
) -> str:
    """Mirror of operators.dedup.cross_source_duplication: distinct
    (digest, source), digest equi-join with the a<b order, distinct
    digest count per source pair; ``prefix_tokens`` digests only the
    first-k-token lead (space-rejoined, identical to Spark's concat_ws
    over the token slice)."""
    if prefix_tokens is None:
        key, src, pre = "md5(text)", "documents", ""
    else:
        key = f"md5(array_to_string(toks[1:{prefix_tokens}], ' '))"
        src = "toks_s"
        pre = (
            "toks_s AS MATERIALIZED (SELECT doc_id, source,"
            " list_filter(string_split_regex(lower(text), '\\s+'),"
            " x -> x <> '') AS toks FROM documents),\n"
        )
    return (
        f"WITH {pre}xd AS MATERIALIZED (\n"
        f"  SELECT DISTINCT {key} AS digest, {group_col} AS s\n"
        f"  FROM {src})\n"
        "SELECT a.s AS source_a, b.s AS source_b,\n"
        "  CAST(count(DISTINCT a.digest) AS BIGINT) AS n_shared_digests\n"
        "FROM xd a JOIN xd b ON b.digest = a.digest AND a.s < b.s\n"
        "GROUP BY 1, 2"
    )


def top_terms_per_doc_sql(k: int = 3) -> str:
    """Mirror of operators.tfidf.top_terms_per_doc: the tf_idf table
    plus a per-doc row_number over (score DESC, term ASC)."""
    return (
        f"WITH {TOKS_CTE},\n"
        "tk AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term"
        " FROM toks_t),\n"
        "tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM tk"
        " GROUP BY doc_id, term),\n"
        "dfx AS MATERIALIZED (SELECT term, count(*) AS df FROM tf"
        " GROUP BY term),\n"
        "nn AS (SELECT count(*) AS n FROM documents),\n"
        "tw AS MATERIALIZED (\n"
        "  SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,\n"
        "    CAST(t.tf * CAST(round(1000000.0 *\n"
        "      ln((SELECT n FROM nn) * 1.0 / d.df)) AS BIGINT) AS BIGINT)\n"
        "      AS tfidf_micros\n"
        "  FROM tf t JOIN dfx d USING (term))\n"
        "SELECT doc_id, rank, term, tf, tfidf_micros FROM (\n"
        "  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id\n"
        "    ORDER BY tfidf_micros DESC, term ASC) AS BIGINT) AS rank\n"
        "  FROM tw)\n"
        f"WHERE rank <= {k}"
    )


def zorder_layout_sql(
    x_col: str = "user_id", bits: int = 8, files: int = 64
) -> str:
    """Mirror of operators.partitioning.zorder_layout: scale both dims
    to 2**bits integer ranks (exact floor division), Morton-interleave
    via a list_transform bit-fold, range-bucket the interleaved key
    (and, for the linear baseline, the x rank alone) into ``files``
    buckets, and roll each layout up to its per-dim mean/max bucket
    span (mean as an exact millionths-of-domain integer ratio)."""
    dom = 1 << bits
    zstep = (dom * dom) // files
    lstep = dom // files
    fold = (
        f"list_sum(list_transform(range(0, {bits}), i ->\n"
        "      (((xs >> i) & 1) << (2 * i))\n"
        "    + (((ys >> i) & 1) << (2 * i + 1))))"
    )
    return (
        "WITH ev AS (\n"
        f"  SELECT CAST({x_col} AS BIGINT) AS x,\n"
        "         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)"
        " AS y\n"
        f"  FROM events WHERE {x_col} IS NOT NULL AND ts IS NOT NULL\n"
        "), b AS (\n"
        "  SELECT MIN(x) AS xmn, MAX(x) AS xmx,"
        " MIN(y) AS ymn, MAX(y) AS ymx FROM ev\n"
        "), s AS MATERIALIZED (\n"
        "  SELECT\n"
        f"    CASE WHEN xmx = xmn THEN 0"
        f" ELSE ((x - xmn) * {dom - 1}) // (xmx - xmn) END AS xs,\n"
        f"    CASE WHEN ymx = ymn THEN 0"
        f" ELSE ((y - ymn) * {dom - 1}) // (ymx - ymn) END AS ys\n"
        "  FROM ev, b\n"
        "), k AS MATERIALIZED (\n"
        f"  SELECT xs, ys, ({fold}) // {zstep} AS zb,"
        f" xs // {lstep} AS lb FROM s\n"
        "), zs AS (\n"
        "  SELECT zb, MAX(xs) - MIN(xs) + 1 AS sx,"
        " MAX(ys) - MIN(ys) + 1 AS sy FROM k GROUP BY zb\n"
        "), ls AS (\n"
        "  SELECT lb, MAX(xs) - MIN(xs) + 1 AS sx,"
        " MAX(ys) - MIN(ys) + 1 AS sy FROM k GROUP BY lb\n"
        "), zr AS MATERIALIZED (\n"
        "  SELECT COUNT(*) AS nb, SUM(sx) AS tx, MAX(sx) AS mx,"
        " SUM(sy) AS ty, MAX(sy) AS my FROM zs\n"
        "), lr AS MATERIALIZED (\n"
        "  SELECT COUNT(*) AS nb, SUM(sx) AS tx, MAX(sx) AS mx,"
        " SUM(sy) AS ty, MAX(sy) AS my FROM ls\n"
        ")\n"
        f"SELECT 'zorder' AS layout, '{x_col}' AS dim,\n"
        "  CAST(nb AS BIGINT) AS n_buckets,\n"
        f"  CAST((1000000 * tx) // (nb * {dom}) AS BIGINT)"
        " AS avg_span_micros,\n"
        "  CAST(mx AS BIGINT) AS max_span FROM zr\n"
        "UNION ALL SELECT 'zorder', 'day', CAST(nb AS BIGINT),\n"
        f"  CAST((1000000 * ty) // (nb * {dom}) AS BIGINT),"
        " CAST(my AS BIGINT) FROM zr\n"
        f"UNION ALL SELECT 'linear', '{x_col}', CAST(nb AS BIGINT),\n"
        f"  CAST((1000000 * tx) // (nb * {dom}) AS BIGINT),"
        " CAST(mx AS BIGINT) FROM lr\n"
        "UNION ALL SELECT 'linear', 'day', CAST(nb AS BIGINT),\n"
        f"  CAST((1000000 * ty) // (nb * {dom}) AS BIGINT),"
        " CAST(my AS BIGINT) FROM lr"
    )


def t_closeness_sql(bucket_micros: int = 100000) -> str:
    """Mirror of operators.profiling.t_closeness over events with the
    (event_type, day, hour) quasi-identifier and user_id sensitive:
    identical micro-share quantization, present-value |p-q| sum plus
    the S_q complement for absent values, div 2, histogram."""
    return (
        "WITH tc_rows AS MATERIALIZED (\n"
        "  SELECT event_type AS et, CAST(ts AS DATE) AS d,"
        " hour(ts) AS h, user_id AS sv FROM events),\n"
        "tc_cu AS MATERIALIZED (\n"
        "  SELECT et, d, h, sv, CAST(count(*) AS BIGINT) AS c\n"
        "  FROM tc_rows GROUP BY 1, 2, 3, 4),\n"
        "tc_gu AS MATERIALIZED (\n"
        "  SELECT sv, CAST(count(*) AS BIGINT) AS g"
        " FROM tc_rows GROUP BY sv),\n"
        "tc_n AS (SELECT CAST(SUM(g) AS BIGINT) AS n FROM tc_gu),\n"
        "tc_qh AS MATERIALIZED (\n"
        "  SELECT sv, (1000000 * g) // (SELECT n FROM tc_n) AS qh\n"
        "  FROM tc_gu),\n"
        "tc_sq AS (SELECT CAST(SUM(qh) AS BIGINT) AS s_q FROM tc_qh),\n"
        "tc_nc AS MATERIALIZED (\n"
        "  SELECT et, d, h, CAST(SUM(c) AS BIGINT) AS n_c\n"
        "  FROM tc_cu GROUP BY 1, 2, 3),\n"
        "tc_per AS MATERIALIZED (\n"
        "  SELECT\n"
        "    (SUM(ABS((1000000 * c) // n_c - qh))\n"
        "     + ((SELECT s_q FROM tc_sq) - SUM(qh))) // 2 AS t_micros,\n"
        "    MAX(n_c) AS rows_in_class\n"
        "  FROM tc_cu JOIN tc_qh USING (sv)"
        " JOIN tc_nc USING (et, d, h)\n"
        "  GROUP BY et, d, h)\n"
        f"SELECT CAST(t_micros // {bucket_micros} AS BIGINT)"
        " AS t_bucket,\n"
        "  CAST(count(*) AS BIGINT) AS n_classes,\n"
        "  CAST(SUM(rows_in_class) AS BIGINT) AS n_rows\n"
        "FROM tc_per GROUP BY 1"
    )


def markov_attribution_sql(
    target: str, sink: str, iterations: int = 8
) -> str:
    """Mirror of operators.cooccurrence.markov_attribution: the
    conversion_prob lag chain and k x k counts, the value iteration
    unrolled over the (removed-channel x state) product space (the
    '__full__' sentinel carries the unmodified chain; removed channels
    pin p=0), then the first-state-weighted start sums and the exact
    removal-effect ratio."""
    tgt = target.replace("'", "''")
    snk = sink.replace("'", "''")
    parts = [
        "mar AS MATERIALIZED (SELECT\n"
        "  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts,"
        " event_id) AS a,\n"
        "  event_type AS b FROM events)",
        "mac AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT)"
        " AS n\n"
        "  FROM mar WHERE a IS NOT NULL GROUP BY a, b)",
        "matot AS MATERIALIZED (SELECT a, CAST(sum(n) AS BIGINT)"
        " AS tot\n"
        "  FROM mac GROUP BY a)",
        "macm AS MATERIALIZED (SELECT c.a, c.b, c.n, t.tot\n"
        "  FROM mac c JOIN matot t USING (a))",
        "mast AS MATERIALIZED (SELECT DISTINCT event_type AS state"
        " FROM events)",
        "mach AS MATERIALIZED (\n"
        f"  SELECT state AS rm FROM mast WHERE state NOT IN"
        f" ('{tgt}', '{snk}')\n"
        "  UNION ALL SELECT '__full__')",
        "mag AS MATERIALIZED (SELECT rm, state FROM mach, mast)",
        "map0 AS MATERIALIZED (SELECT rm, state,"
        " CAST(0 AS BIGINT) AS p FROM mag)",
    ]
    for i in range(1, iterations + 1):
        prev = f"map{i - 1}"
        parts.append(
            f"map{i} AS MATERIALIZED (\n"
            f"  SELECT g.rm, g.state,\n"
            f"    CAST(CASE WHEN g.state = '{tgt}' THEN 1000000\n"
            f"      WHEN g.state = '{snk}' THEN 0\n"
            "      WHEN g.state = g.rm THEN 0\n"
            "      ELSE COALESCE(m.s2, 0) END AS BIGINT) AS p\n"
            "  FROM mag g LEFT JOIN (\n"
            "    SELECT q.rm, cm.a AS state,"
            " SUM((q.p * cm.n) // cm.tot) AS s2\n"
            f"    FROM macm cm JOIN {prev} q ON q.state = cm.b\n"
            "    GROUP BY q.rm, cm.a) m\n"
            "  ON m.rm = g.rm AND m.state = g.state)"
        )
    parts.append(
        "mafir AS MATERIALIZED (\n"
        "  SELECT state, CAST(count(*) AS BIGINT) AS fcnt FROM (\n"
        "    SELECT event_type AS state, row_number() OVER (\n"
        "      PARTITION BY user_id ORDER BY ts, event_id) AS rn\n"
        "    FROM events) WHERE rn = 1 GROUP BY state)"
    )
    parts.append(
        "mann AS (SELECT CAST(SUM(fcnt) AS BIGINT) AS na FROM mafir)"
    )
    parts.append(
        "maps AS MATERIALIZED (\n"
        "  SELECT p.rm, CAST(SUM(\n"
        "    (f.fcnt * p.p) // (SELECT na FROM mann)) AS BIGINT)"
        " AS p_start\n"
        f"  FROM map{iterations} p JOIN mafir f USING (state)\n"
        "  GROUP BY p.rm)"
    )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        "SELECT c.rm AS channel,\n"
        "  f.p_start AS p_full_micros,\n"
        "  c.p_start AS p_removed_micros,\n"
        "  CAST(CASE WHEN f.p_start > 0 THEN\n"
        "    ((f.p_start - c.p_start) * 1000000) // f.p_start\n"
        "  END AS BIGINT) AS removal_effect_micros\n"
        "FROM maps c, maps f\n"
        "WHERE f.rm = '__full__' AND c.rm <> '__full__'"
    )


def kaplan_meier_sql() -> str:
    """Mirror of operators.analytics.kaplan_meier: per-unit lifetime in
    days with horizon censoring, the descending at-risk running sum on
    the duration-level table, and the product-limit fold as a recursive
    CTE over the row-numbered death times (// truncation == Spark's
    remainder-subtract on these non-negative longs)."""
    return (
        "WITH RECURSIVE km_per AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    min(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS first_d,\n"
        "    max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS last_d\n"
        "  FROM events GROUP BY 1),\n"
        "km_hi AS (SELECT max(last_d) AS hi FROM km_per),\n"
        "km_durs AS MATERIALIZED (\n"
        "  SELECT last_d - first_d AS t,\n"
        "    CAST(count(*) AS BIGINT) AS c,\n"
        "    CAST(sum(CASE WHEN last_d = (SELECT hi FROM km_hi)"
        " THEN 0 ELSE 1 END) AS BIGINT) AS d\n"
        "  FROM km_per GROUP BY 1),\n"
        "km_idx AS MATERIALIZED (\n"
        "  SELECT t, d, n, row_number() OVER (ORDER BY t) AS i FROM (\n"
        "    SELECT t, d, CAST(sum(c) OVER (ORDER BY t DESC\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS n\n"
        "    FROM km_durs) WHERE d > 0),\n"
        "km_fold(i, t, d, n, s) AS (\n"
        "  SELECT i, t, d, n,\n"
        "    CAST((1000000 * (n - d)) // n AS BIGINT) AS s\n"
        "  FROM km_idx WHERE i = 1\n"
        "  UNION ALL\n"
        "  SELECT k.i, k.t, k.d, k.n,\n"
        "    CAST((f.s * (k.n - k.d)) // k.n AS BIGINT)\n"
        "  FROM km_fold f JOIN km_idx k ON k.i = f.i + 1)\n"
        "SELECT t AS duration_days, n AS n_risk, d AS n_deaths,\n"
        "  s AS survival_micros\n"
        "FROM km_fold"
    )


def rfm_segments_sql(buckets: int = 4) -> str:
    """Mirror of operators.analytics.rfm_segments: per-unit
    recency/frequency/monetary (identical per-event cents rounding),
    the closed-form bucket rule ((rank-1)*B) // N + 1 over
    row_number(ORDER BY metric, u) — the same total order
    assign_dense_ids fixes — then the segment-lattice rollup."""
    B = int(buckets)
    return (
        "WITH rfm_per AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS last_d,\n"
        "    CAST(count(*) AS BIGINT) AS f,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS m\n"
        "  FROM events GROUP BY 1),\n"
        "rfm_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rfm_per),\n"
        "rfm_base AS MATERIALIZED (\n"
        "  SELECT u, (SELECT max(last_d) FROM rfm_per) - last_d AS r,"
        " f, m\n"
        "  FROM rfm_per),\n"
        "rfm_seg AS MATERIALIZED (\n"
        "  SELECT u, f, m,\n"
        f"    CAST(((row_number() OVER (ORDER BY r, u) - 1) * {B})\n"
        "      // (SELECT n FROM rfm_n) + 1 AS INT) AS r_quartile,\n"
        f"    CAST(((row_number() OVER (ORDER BY f, u) - 1) * {B})\n"
        "      // (SELECT n FROM rfm_n) + 1 AS INT) AS f_quartile,\n"
        f"    CAST(((row_number() OVER (ORDER BY m, u) - 1) * {B})\n"
        "      // (SELECT n FROM rfm_n) + 1 AS INT) AS m_quartile\n"
        "  FROM rfm_base)\n"
        "SELECT r_quartile, f_quartile, m_quartile,\n"
        "  CAST(count(*) AS BIGINT) AS n_users,\n"
        "  CAST(sum(f) AS BIGINT) AS sum_events,\n"
        "  CAST(sum(m) AS BIGINT) AS sum_monetary_cents\n"
        "FROM rfm_seg GROUP BY 1, 2, 3"
    )


def acf_daily_sql(max_lag: int = 7) -> str:
    """Mirror of operators.analytics.acf_daily: zero-filled day spine,
    n^2-scaled integer deviations, lag equi-join, HUGEINT final ratio
    (measured: HUGEINT // == Spark DECIMAL(38,0) div, truncation toward
    zero including negatives)."""
    L = int(max_lag)
    return (
        "WITH acfd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "acfr AS (SELECT min(d) AS lo, max(d) AS hi,\n"
        "  CAST(sum(y) AS BIGINT) AS s FROM acfd),\n"
        "acfs AS MATERIALIZED (\n"
        "  SELECT unnest(range(lo, hi + 1)) AS d,\n"
        "    CAST(hi - lo + 1 AS BIGINT) AS n, s FROM acfr),\n"
        "acfv AS MATERIALIZED (\n"
        "  SELECT sp.d,\n"
        "    CAST(sp.n * COALESCE(dl.y, 0) - sp.s AS BIGINT) AS dev,\n"
        "    sp.n\n"
        "  FROM acfs sp LEFT JOIN acfd dl USING (d)),\n"
        "acfden AS (SELECT CAST(sum(dev * dev) AS BIGINT) AS den,\n"
        "  max(n) AS n FROM acfv),\n"
        "acfnum AS MATERIALIZED (\n"
        "  SELECT l.lag, CAST(sum(a.dev * b.dev) AS BIGINT) AS num\n"
        f"  FROM acfv a CROSS JOIN (SELECT unnest(range(1, {L + 1}))"
        " AS lag) l\n"
        "  JOIN acfv b ON b.d = a.d + l.lag\n"
        "  GROUP BY l.lag)\n"
        "SELECT CAST(m.lag AS INT) AS lag, q.n AS n_days,\n"
        "  CAST(CASE WHEN q.den > 0 THEN\n"
        "    (CAST(m.num AS HUGEINT) * 1000000)"
        " // CAST(q.den AS HUGEINT)\n"
        "  END AS BIGINT) AS acf_micros\n"
        "FROM acfnum m, acfden q"
    )


def readability_flesch_sql() -> str:
    """Mirror of functions.text.flesch_exprs + flesch_micros_expr: the
    repo-standard whitespace tokens, [.!?]+ sentence runs (min 1),
    [aeiouy]+ vowel-run syllables (min 1/token), and the two
    non-negative truncating micro terms."""
    return (
        "WITH rf_tok AS MATERIALIZED (\n"
        "  SELECT doc_id, text,\n"
        "    list_filter(string_split_regex(lower(text), '\\s+'),"
        " x -> x <> '') AS toks\n"
        "  FROM documents),\n"
        "rf_cnt AS MATERIALIZED (\n"
        "  SELECT doc_id,\n"
        "    CAST(len(toks) AS BIGINT) AS n_words,\n"
        "    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)"
        " AS BIGINT) AS n_sentences,\n"
        "    CAST(COALESCE(list_sum(list_transform(toks,\n"
        "      t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')),"
        " 1))), 0) AS BIGINT) AS n_syllables\n"
        "  FROM rf_tok)\n"
        "SELECT doc_id, n_words, n_sentences, n_syllables,\n"
        "  CAST(CASE WHEN n_words > 0 THEN 206835000\n"
        "    - (1015000 * n_words) // n_sentences\n"
        "    - (84600000 * n_syllables) // n_words\n"
        "  END AS BIGINT) AS flesch_micros\n"
        "FROM rf_cnt"
    )


def four_cliques_sql() -> str:
    """Mirror of algos.triangles.four_clique_count: ordered K4
    enumeration — each clique once from its id-ordered triangle plus
    the three arcs into the id-max extension vertex (the Spark side
    orients by degree; the enumerated SET is identical)."""
    body = (
        f", {_TRI_CTES}\n"
        "SELECT CAST(count(*) AS BIGINT) AS cliques4\n"
        "FROM tri t\n"
        "JOIN o e4 ON e4.a = t.v3\n"
        "JOIN o e5 ON e5.a = t.v2 AND e5.b = e4.b\n"
        "JOIN o e6 ON e6.a = t.v1 AND e6.b = e4.b"
    )
    return _graph_query(body)


def widest_path_sql(source: int = 0, supersteps: int = 7) -> str:
    """Mirror of algos.sssp.WidestPath after ``supersteps`` (rounds =
    supersteps − 1, same ss0-initializes convention as sssp_sql):
    unrolled max-min relaxation — resending from all reached vertices
    is value-identical to the engine's changed-only sends because the
    semiring is monotone.  1e18 = the source's unbounded-capacity
    sentinel, NULL = unreached, both mirrored."""
    parts = [
        _WEDGES_CTE,
        f"wp0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} "
        "THEN CAST(1.0e18 AS DOUBLE) END AS wd FROM vertices)",
    ]
    for k in range(1, supersteps):
        prev = f"wp{k - 1}"
        parts.append(
            f"wp{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"         CASE WHEN m.d IS NULL THEN p.wd\n"
            f"              WHEN p.wd IS NULL THEN m.d\n"
            f"              ELSE greatest(p.wd, m.d) END AS wd\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, max(least(q.wd, e.w)) AS d\n"
            f"    FROM wedges e JOIN {prev} q"
            " ON q.id = e.src AND q.wd IS NOT NULL\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    body = (
        ", " + ",\n".join(parts) + "\n"
        f"SELECT id, round(wd, 6) AS width FROM wp{supersteps - 1}"
    )
    return _graph_query(body)


def ewma_daily_sql(alpha_num: int = 1, alpha_den: int = 4) -> str:
    """Mirror of operators.analytics.ewma_daily: zero-filled day spine,
    the fold as a recursive CTE over row-numbered days (non-negative
    // == Spark's remainder-subtract), NULL residual at t=0."""
    a, b, den = int(alpha_num), int(alpha_den - alpha_num), int(alpha_den)
    return (
        "WITH RECURSIVE ewd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),\n"
        "ewr AS (SELECT min(d) AS lo, max(d) AS hi FROM ewd),\n"
        "ews AS MATERIALIZED (\n"
        "  SELECT unnest(range(lo, hi + 1)) AS d FROM ewr),\n"
        "ewf AS MATERIALIZED (\n"
        "  SELECT s.d, CAST(COALESCE(e.y, 0) AS BIGINT) AS y,\n"
        "    row_number() OVER (ORDER BY s.d) AS i\n"
        "  FROM ews s LEFT JOIN ewd e USING (d)),\n"
        "ewfold(i, d, y, s, r) AS (\n"
        "  SELECT i, d, y, CAST(1000000 * y AS BIGINT),\n"
        "    CAST(NULL AS BIGINT)\n"
        "  FROM ewf WHERE i = 1\n"
        "  UNION ALL\n"
        "  SELECT f.i, f.d, f.y,\n"
        f"    CAST(({a} * 1000000 * f.y + {b} * p.s) // {den}"
        " AS BIGINT),\n"
        "    CAST(1000000 * f.y - p.s AS BIGINT)\n"
        "  FROM ewfold p JOIN ewf f ON f.i = p.i + 1)\n"
        "SELECT d, y, s AS ewma_micros, r AS resid_micros FROM ewfold"
    )


def ipf_raking_sql(iterations: int = 4) -> str:
    """Mirror of operators.packing.ipf_raking: one contingency
    groupBy, then the alternating row/column scalings unrolled —
    HUGEINT products for the scale ratio and the margin sums
    (== Spark's DECIMAL(38,0) path, truncation toward zero)."""
    parts = [
        "ipfc AS MATERIALIZED (\n"
        "  SELECT lang AS r, source AS c,"
        " CAST(count(*) AS BIGINT) AS n\n"
        "  FROM documents GROUP BY 1, 2)",
        "ipft AS (SELECT CAST(sum(n) AS BIGINT) AS total,\n"
        "  CAST(count(DISTINCT r) AS BIGINT) AS nr FROM ipfc)",
        "ipfct AS MATERIALIZED (SELECT c,"
        " CAST(sum(n) AS BIGINT) AS t_col FROM ipfc GROUP BY 1)",
        "ipfw0 AS MATERIALIZED (\n"
        "  SELECT r, c, n, CAST(1000000 AS BIGINT) AS w,\n"
        "    (SELECT CAST((total - total % nr) // nr AS BIGINT)"
        " FROM ipft) AS t_row\n"
        "  FROM ipfc)",
    ]
    for k in range(1, iterations + 1):
        prev = f"ipfw{k - 1}"
        parts.append(
            f"ipfr{k} AS MATERIALIZED (\n"
            f"  SELECT w.r, w.c, w.n, w.t_row,\n"
            "    CAST(CASE WHEN m.ms > 0 THEN\n"
            "      (CAST(w.w AS HUGEINT) * w.t_row * 1000000) // m.ms\n"
            "    ELSE w.w END AS BIGINT) AS w\n"
            f"  FROM {prev} w JOIN (\n"
            "    SELECT r, CAST(sum(CAST(n AS HUGEINT) * w) AS HUGEINT)"
            " AS ms\n"
            f"    FROM {prev} GROUP BY r) m USING (r))"
        )
        parts.append(
            f"ipfw{k} AS MATERIALIZED (\n"
            f"  SELECT w.r, w.c, w.n, w.t_row,\n"
            "    CAST(CASE WHEN m.ms > 0 THEN\n"
            "      (CAST(w.w AS HUGEINT) * ct.t_col * 1000000) // m.ms\n"
            "    ELSE w.w END AS BIGINT) AS w\n"
            f"  FROM ipfr{k} w JOIN (\n"
            "    SELECT c, CAST(sum(CAST(n AS HUGEINT) * w) AS HUGEINT)"
            " AS ms\n"
            f"    FROM ipfr{k} GROUP BY c) m USING (c)\n"
            "  JOIN ipfct ct USING (c))"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        "SELECT r AS lang, c AS source, n AS n_docs,"
        " w AS weight_micros\n"
        f"FROM ipfw{iterations}"
    )


def label_spreading_sql(
    seed_mod: int = 3, iterations: int = 6
) -> str:
    """Mirror of algos.community.label_spreading over the transcript
    graph with tv roles: und closure + degree, seeds pinned one-hot,
    per-round neighbor-sum // degree (non-negative, == Spark's
    remainder-subtract)."""
    roles = ("user", "assistant", "tool")
    cols = [f"p_{r}_micros" for r in roles]
    pin = ",\n".join(
        f"    CAST(CASE WHEN v.id % {seed_mod} = 0 AND t.role = '{r}'"
        f" THEN 1000000 ELSE 0 END AS BIGINT) AS {c}"
        for r, c in zip(roles, cols)
    )
    parts = [
        "lsd AS MATERIALIZED (SELECT src AS id,"
        " CAST(count(*) AS BIGINT) AS dg FROM und GROUP BY 1)",
        "lsb AS MATERIALIZED (\n"
        f"  SELECT v.id, CASE WHEN v.id % {seed_mod} = 0 THEN 1"
        " ELSE 0 END AS seed,\n"
        "    CAST(COALESCE(d.dg, 0) AS BIGINT) AS dg,\n"
        f"{pin}\n"
        "  FROM vertices v JOIN tv t USING (id)\n"
        "  LEFT JOIN lsd d ON d.id = v.id)",
        "ls0 AS MATERIALIZED (SELECT id, "
        + ", ".join(cols)
        + " FROM lsb)",
    ]
    for k in range(1, iterations + 1):
        prev = f"ls{k - 1}"
        upd = ",\n".join(
            f"    CAST(CASE WHEN b.seed = 1 THEN b.{c}\n"
            f"      WHEN b.dg > 0 THEN COALESCE(m.s_{c}, 0) // b.dg\n"
            f"      ELSE 0 END AS BIGINT) AS {c}"
            for c in cols
        )
        sums = ", ".join(f"SUM(q.{c}) AS s_{c}" for c in cols)
        parts.append(
            f"ls{k} AS MATERIALIZED (\n"
            f"  SELECT b.id,\n{upd}\n"
            "  FROM lsb b LEFT JOIN (\n"
            f"    SELECT u.dst AS id, {sums}\n"
            f"    FROM und u JOIN {prev} q ON q.id = u.src\n"
            "    GROUP BY u.dst) m ON m.id = b.id)"
        )
    body = (
        ", " + ",\n".join(parts) + "\n"
        "SELECT l.id, b.seed, "
        + ", ".join(f"l.{c}" for c in cols)
        + f"\nFROM ls{iterations} l JOIN lsb b USING (id)"
    )
    return _graph_query(body)


def deanon_uniqueness_sql() -> str:
    """Mirror of algos.stats.deanon_uniqueness over the user contact
    graph: symmetrized distinct closure, (degree, md5 of the
    numerically sorted neighbor-degree list) signature classes, class-
    size histogram."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id,"
        " event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src, user_id AS dst\n"
        "  FROM ev) WHERE src IS NOT NULL AND src <> dst),\n"
        "du AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM ce\n"
        "  UNION ALL SELECT dst, src FROM ce) WHERE src <> dst),\n"
        "dd AS MATERIALIZED (SELECT src AS id,"
        " CAST(count(*) AS BIGINT) AS dg FROM du GROUP BY 1),\n"
        "dsig AS MATERIALIZED (\n"
        "  SELECT u.src AS id, CAST(count(*) AS BIGINT) AS dg,\n"
        "    md5(array_to_string(list_sort(list(d.dg)), ',')) AS h\n"
        "  FROM du u JOIN dd d ON d.id = u.dst GROUP BY u.src),\n"
        "dcls AS MATERIALIZED (SELECT dg, h,"
        " CAST(count(*) AS BIGINT) AS class_size\n"
        "  FROM dsig GROUP BY 1, 2)\n"
        "SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes,\n"
        "  CAST(sum(class_size) AS BIGINT) AS n_vertices\n"
        "FROM dcls GROUP BY 1"
    )


def dow_seasonality_sql() -> str:
    """Mirror of operators.analytics.dow_seasonality: zero-filled day
    spine, (d + 3) % 7 weekday (0 = Monday), truncating micro means
    and their difference."""
    return (
        "WITH dsd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),\n"
        "dsr AS (SELECT min(d) AS lo, max(d) AS hi FROM dsd),\n"
        "dsf AS MATERIALIZED (\n"
        "  SELECT CAST((s.d + 3) % 7 AS INT) AS dow,\n"
        "    CAST(COALESCE(e.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM dsr) s\n"
        "  LEFT JOIN dsd e USING (d)),\n"
        "dst0 AS (SELECT CAST(count(*) AS BIGINT) AS nd,\n"
        "  CAST(sum(y) AS BIGINT) AS sy FROM dsf)\n"
        "SELECT dow, CAST(count(*) AS BIGINT) AS n_days,\n"
        "  CAST(sum(y) AS BIGINT) AS sum_events,\n"
        "  CAST((1000000 * sum(y)) // count(*) AS BIGINT)"
        " AS mean_daily_micros,\n"
        "  CAST((1000000 * sum(y)) // count(*)\n"
        "    - (SELECT (1000000 * sy) // nd FROM dst0) AS BIGINT)"
        " AS dev_micros\n"
        "FROM dsf GROUP BY 1"
    )


def event_trigrams_sql(k: int = 20) -> str:
    """Mirror of operators.temporal.event_trigrams: per-actor lag
    window, trigram counts, deterministic top-k."""
    return (
        "SELECT a, b, c, CAST(count(*) AS BIGINT) AS n FROM (\n"
        "  SELECT lag(event_type, 2) OVER w AS a,\n"
        "    lag(event_type) OVER w AS b, event_type AS c\n"
        "  FROM events\n"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))\n"
        "WHERE a IS NOT NULL GROUP BY 1, 2, 3\n"
        f"ORDER BY n DESC, a, b, c LIMIT {int(k)}"
    )


def props_json_stats_sql(field: str = "k") -> str:
    """Mirror of operators.profiling.props_json_stats: JSON field
    extraction (json_extract == Spark get_json_object on well-formed
    payloads, NULL propagating) and one grouped profile."""
    return (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(count(f) AS BIGINT) AS n_with_field,\n"
        "  CAST(min(f) AS BIGINT) AS min_f,\n"
        "  CAST(max(f) AS BIGINT) AS max_f,\n"
        "  CAST(sum(f) AS BIGINT) AS sum_f\n"
        "FROM (SELECT event_type,\n"
        f"  CAST(json_extract(props, '$.{field}') AS BIGINT) AS f\n"
        "  FROM events) GROUP BY 1"
    )


def cohort_ltv_sql() -> str:
    """Mirror of operators.analytics.cohort_ltv: first-week cohorts,
    per-event cents, per-cohort cumulative sum along offsets."""
    return (
        "WITH cw AS MATERIALIZED (\n"
        "  SELECT user_id,\n"
        "    CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS week,\n"
        "    CAST(round(value * 100) AS BIGINT) AS cents\n"
        "  FROM events),\n"
        "cc AS MATERIALIZED (SELECT user_id, min(week) AS cohort_week\n"
        "  FROM cw GROUP BY 1),\n"
        "per AS MATERIALIZED (\n"
        "  SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,\n"
        "    CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users,\n"
        "    CAST(sum(w.cents) AS BIGINT) AS sum_cents\n"
        "  FROM cw w JOIN cc c USING (user_id) GROUP BY 1, 2)\n"
        "SELECT cohort_week, week_offset, n_users, sum_cents,\n"
        "  CAST(sum(sum_cents) OVER (PARTITION BY cohort_week\n"
        "    ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING\n"
        "    AND CURRENT ROW) AS BIGINT) AS cum_cents\n"
        "FROM per"
    )


def audience_overlap_exact_sql() -> str:
    """Mirror of operators.analytics.audience_overlap_exact: distinct
    presence, unit-key self-join for pair intersections, closed-form
    union and truncating Jaccard micros."""
    return (
        "WITH ao AS MATERIALIZED (SELECT DISTINCT user_id AS u,"
        " event_type AS g FROM events),\n"
        "aos AS MATERIALIZED (SELECT g, CAST(count(*) AS BIGINT)"
        " AS sz FROM ao GROUP BY 1),\n"
        "aoi AS MATERIALIZED (\n"
        "  SELECT a.g AS g_a, b.g AS g_b,"
        " CAST(count(*) AS BIGINT) AS n_inter\n"
        "  FROM ao a JOIN ao b ON a.u = b.u AND a.g < b.g\n"
        "  GROUP BY 1, 2)\n"
        "SELECT g_a, g_b, sa.sz AS n_a, sb.sz AS n_b, n_inter,\n"
        "  sa.sz + sb.sz - n_inter AS n_union,\n"
        "  CAST((1000000 * n_inter) // (sa.sz + sb.sz - n_inter)"
        " AS BIGINT) AS jaccard_micros\n"
        "FROM aoi JOIN aos sa ON sa.g = aoi.g_a\n"
        "JOIN aos sb ON sb.g = aoi.g_b"
    )


def conversion_lag_quantiles_sql(
    start_type: str = "view", end_type: str = "purchase"
) -> str:
    """Mirror of operators.temporal.conversion_lag_quantiles: first
    start/end per actor, whole-second lag, the grouped_quantiles rank
    rule (n·pct + 99) // 100 over one group."""
    s, e = start_type.replace("'", "''"), end_type.replace("'", "''")
    picks = ",\n".join(
        f"  CAST(max(CASE WHEN rn = (n * {p} + 99) // 100"
        f" THEN lag_s END) AS BIGINT) AS p{p}"
        for p in (25, 50, 75)
    )
    return (
        "WITH clp AS MATERIALIZED (\n"
        "  SELECT user_id,\n"
        f"    min(CASE WHEN event_type = '{s}' THEN"
        " CAST(epoch_us(ts) AS BIGINT) END) AS t0,\n"
        f"    min(CASE WHEN event_type = '{e}' THEN"
        " CAST(epoch_us(ts) AS BIGINT) END) AS t1\n"
        "  FROM events GROUP BY 1),\n"
        "cll AS MATERIALIZED (\n"
        "  SELECT CAST((t1 - t0) // 1000000 AS BIGINT) AS lag_s\n"
        "  FROM clp WHERE t0 IS NOT NULL AND t1 > t0),\n"
        "clr AS MATERIALIZED (\n"
        "  SELECT lag_s, row_number() OVER (ORDER BY lag_s) AS rn,\n"
        "    count(*) OVER () AS n FROM cll)\n"
        "SELECT CAST(max(n) AS BIGINT) AS n,\n"
        f"{picks}\n"
        "FROM clr HAVING count(*) > 0"
    )


def _naive_bayes_pred_ctes(
    labels: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    words: tuple[str, ...] = tuple(STOPWORDS),
) -> str:
    """The CTE chain of operators.classify.naive_bayes_predictions up
    to ``nbpred`` (rk = 1 rows are the per-doc argmax): even/odd train
    split, Laplace micro parameters, the word-order truncating score
    fold as a nested // chain, argmax via (s DESC, cand DESC)
    row_number (== Spark's struct max tie rule).  Shared by the
    confusion-matrix, kappa, and McNemar oracles."""
    L = len(labels)
    lab = ", ".join(f"'{v}'" for v in labels)
    bits = ",\n".join(
        f"    CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END"
        f" AS b{i}"
        for i, w in enumerate(words)
    )
    ps = ",\n".join(
        f"    CAST(((sum(b{i}) + 1) * 1000000) // (count(*) + 2)"
        f" AS BIGINT) AS p{i}"
        for i in range(len(words))
    )
    fold = "p.prior * 1000000"
    for i in range(len(words)):
        q = (
            f"CASE WHEN t.b{i} = 1 THEN p.p{i}"
            f" ELSE 1000000 - p.p{i} END"
        )
        fold = f"(({fold}) * ({q})) // 1000000"
    return (
        "WITH nbt AS MATERIALIZED (\n"
        "  SELECT doc_id, lang AS y,\n"
        "    list_filter(string_split_regex(lower(text), '\\s+'),"
        " x -> x <> '') AS toks\n"
        f"  FROM documents WHERE lang IN ({lab})),\n"
        "nbf AS MATERIALIZED (\n"
        f"  SELECT doc_id, y,\n{bits}\n  FROM nbt),\n"
        "nbtr AS MATERIALIZED (SELECT * FROM nbf"
        " WHERE doc_id % 2 = 0),\n"
        "nbn AS (SELECT CAST(count(*) AS BIGINT) AS ntr FROM nbtr),\n"
        "nbp AS MATERIALIZED (\n"
        "  SELECT y AS cand,\n"
        "    CAST(((count(*) + 1) * 1000000)"
        f" // ((SELECT ntr FROM nbn) + {L}) AS BIGINT) AS prior,\n"
        f"{ps}\n"
        "  FROM nbtr GROUP BY y),\n"
        "nbs AS MATERIALIZED (\n"
        "  SELECT t.doc_id, t.y AS true_label, p.cand,\n"
        f"    CAST({fold} AS BIGINT) AS s\n"
        "  FROM nbf t CROSS JOIN nbp p WHERE t.doc_id % 2 = 1),\n"
        "nbpred AS MATERIALIZED (\n"
        "  SELECT doc_id, true_label, cand,\n"
        "    row_number() OVER (PARTITION BY doc_id"
        " ORDER BY s DESC, cand DESC) AS rk\n"
        "  FROM nbs)"
    )


def naive_bayes_confusion_sql(
    labels: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    words: tuple[str, ...] = tuple(STOPWORDS),
) -> str:
    """Mirror of operators.classify.naive_bayes_confusion: the shared
    prediction CTEs rolled up into the confusion matrix."""
    return (
        _naive_bayes_pred_ctes(labels, words)
        + "\nSELECT true_label, cand AS pred_label,\n"
        "  CAST(count(*) AS BIGINT) AS n\n"
        "FROM nbpred WHERE rk = 1 GROUP BY 1, 2"
    )


def dataset_fingerprint_sql() -> str:
    """Mirror of operators.profiling.dataset_fingerprint: per-source +
    rollup XOR/min/max over hash48(text)."""
    return (
        "SELECT COALESCE(source, '(all)') AS source,\n"
        "  CAST(count(*) AS BIGINT) AS n_docs,\n"
        "  CAST(bit_xor(h) AS BIGINT) AS xor48,\n"
        "  CAST(min(h) AS BIGINT) AS min_h,\n"
        "  CAST(max(h) AS BIGINT) AS max_h\n"
        "FROM (SELECT source, "
        + _h48("text")
        + " AS h FROM documents)\n"
        "GROUP BY ROLLUP (source)"
    )


def ab_conversion_ztest_sql(
    cohort_type: str = "signup", convert_type: str = "purchase"
) -> str:
    """Mirror of operators.analytics.ab_conversion_ztest: per-unit
    flags, the pooled two-proportion z with the identical float
    expression structure, 6dp once."""
    co = cohort_type.replace("'", "''")
    cv = convert_type.replace("'", "''")
    pa = "(conv_a / n_a)"
    pb = "(conv_b / n_b)"
    pp = "((conv_a + conv_b) / (n_a + n_b))"
    z = (
        f"({pa} - {pb}) / sqrt({pp} * (1 - {pp})"
        " * (1.0 / n_a + 1.0 / n_b))"
    )
    return (
        "WITH abp AS MATERIALIZED (\n"
        "  SELECT user_id,\n"
        f"    max(CASE WHEN event_type = '{co}' THEN 1 ELSE 0 END)"
        " AS a,\n"
        f"    max(CASE WHEN event_type = '{cv}' THEN 1 ELSE 0 END)"
        " AS c\n"
        "  FROM events GROUP BY 1),\n"
        "aba AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,\n"
        "  CAST(sum(a * c) AS BIGINT) AS conv_a,\n"
        "  CAST(sum(1 - a) AS BIGINT) AS n_b,\n"
        "  CAST(sum((1 - a) * c) AS BIGINT) AS conv_b FROM abp)\n"
        "SELECT n_a, conv_a, n_b, conv_b,\n"
        f"  CASE WHEN n_a > 0 THEN round({pa}, 6) END AS rate_a,\n"
        f"  CASE WHEN n_b > 0 THEN round({pb}, 6) END AS rate_b,\n"
        "  CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0\n"
        "    AND conv_a + conv_b < n_a + n_b\n"
        f"  THEN round({z}, 6) END AS z\n"
        "FROM aba"
    )


def mann_whitney_u_sql(
    type_a: str = "purchase", type_b: str = "click"
) -> str:
    """Mirror of operators.analytics.mann_whitney_u: value-alphabet
    groupBy, cumulative tie-group ranks, doubled rank sums (exact)."""
    a = type_a.replace("'", "''")
    b = type_b.replace("'", "''")
    return (
        "WITH mwc AS MATERIALIZED (\n"
        f"  SELECT CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END"
        " AS is_a,\n"
        "    CAST(round(value * 100) AS BIGINT) AS v\n"
        f"  FROM events WHERE event_type IN ('{a}', '{b}')),\n"
        "mwp AS MATERIALIZED (SELECT v,"
        " CAST(count(*) AS BIGINT) AS cnt,\n"
        "  CAST(sum(is_a) AS BIGINT) AS cnt_a FROM mwc GROUP BY 1),\n"
        "mwr AS MATERIALIZED (SELECT v, cnt, cnt_a,\n"
        "  CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) - cnt AS BIGINT) AS before\n"
        "  FROM mwp),\n"
        "mwa AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,\n"
        "  CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b,\n"
        "  CAST(sum(cnt_a * (2 * before + cnt + 1)) AS BIGINT)"
        " AS r2a FROM mwr)\n"
        "SELECT n_a, n_b,\n"
        "  CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,\n"
        "  CAST(2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS BIGINT)"
        " AS u_b_x2\n"
        "FROM mwa"
    )


def burst_rate_max_sql(window_seconds: int = 60) -> str:
    """Mirror of operators.analytics.burst_rate_max: per-unit RANGE
    window over event-time seconds, per-unit max, histogram."""
    w = int(window_seconds) - 1
    return (
        "WITH brs AS MATERIALIZED (SELECT user_id AS u,\n"
        "  CAST(epoch_us(ts) AS BIGINT) // 1000000 AS s FROM events),\n"
        "brb AS MATERIALIZED (SELECT u,\n"
        "  count(*) OVER (PARTITION BY u ORDER BY s\n"
        f"    RANGE BETWEEN {w} PRECEDING AND CURRENT ROW) AS burst\n"
        "  FROM brs),\n"
        "brm AS MATERIALIZED (SELECT u,"
        " CAST(max(burst) AS BIGINT) AS max_burst\n"
        "  FROM brb GROUP BY 1)\n"
        "SELECT max_burst, CAST(count(*) AS BIGINT) AS n_users\n"
        "FROM brm GROUP BY 1"
    )


def hour_dow_heatmap_sql() -> str:
    """Mirror of operators.analytics.hour_dow_heatmap."""
    return (
        "WITH hdc AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS dow,\n"
        "    CAST((CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24"
        " AS INT) AS hour\n"
        "  FROM events),\n"
        "hdg AS MATERIALIZED (SELECT dow, hour,"
        " CAST(count(*) AS BIGINT) AS n FROM hdc GROUP BY 1, 2),\n"
        "hdt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM hdg)\n"
        "SELECT dow, hour, n,\n"
        "  CAST((1000000 * n) // (SELECT t FROM hdt) AS BIGINT)"
        " AS share_micros\n"
        "FROM hdg"
    )


def events_cube_sql() -> str:
    """Mirror of operators.analytics.events_cube: CUBE lattice over
    (event_type, epoch weekday), explicit grouping id, sentinel keys."""
    return (
        "SELECT COALESCE(event_type, '(all)') AS event_type,\n"
        "  CAST(COALESCE(dow, -1) AS BIGINT) AS dow,\n"
        "  CAST(GROUPING(event_type) * 2 + GROUPING(dow) AS BIGINT)"
        " AS gid,\n"
        "  CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(vm) AS BIGINT) AS sum_value_micros\n"
        "FROM (SELECT event_type,\n"
        "  CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3) % 7"
        " AS INT) AS dow,\n"
        "  CAST(round(value * 1000000) AS BIGINT) AS vm FROM events)\n"
        "GROUP BY CUBE (event_type, dow)"
    )


def feature_hash_collisions_sql(
    num_buckets: int = 1024, salt: str = "fh"
) -> str:
    """Mirror of operators.tfidf.feature_hash_collisions: distinct
    vocabulary, hash48 % buckets, occupancy histogram incl. empty
    slots via the bucket spine."""
    B = int(num_buckets)
    h = _h48(f"'{salt}:' || tok")
    return (
        "WITH fhv AS MATERIALIZED (SELECT DISTINCT\n"
        "  unnest(list_filter(string_split_regex(lower(text),"
        " '\\s+'), x -> x <> '')) AS tok\n"
        "  FROM documents),\n"
        "fho AS MATERIALIZED (SELECT b,"
        " CAST(count(*) AS BIGINT) AS k FROM (\n"
        f"  SELECT {h} % {B} AS b FROM fhv) GROUP BY 1),\n"
        f"fhs AS (SELECT unnest(range(0, {B})) AS b),\n"
        "fhf AS MATERIALIZED (SELECT CAST(COALESCE(o.k, 0) AS BIGINT)"
        " AS k\n"
        "  FROM fhs s LEFT JOIN fho o USING (b))\n"
        "SELECT k AS tokens_in_bucket,\n"
        "  CAST(count(*) AS BIGINT) AS n_buckets,\n"
        "  CAST(sum(k) AS BIGINT) AS n_tokens\n"
        "FROM fhf GROUP BY 1"
    )


def isotonic_calibration_sql(
    num_buckets: int = 16, positive_lang: str = "en"
) -> str:
    """Mirror of operators.packing.isotonic_calibration: the 6dp
    quality score, the closed-form rank bucket, per-bucket counts,
    prefix sums, and the minimax isotonic fit as nested DuckDB list
    lambdas (verified: nested lambda capture matches Spark's)."""
    B = int(num_buckets)
    pl = positive_lang.replace("'", "''")
    return (
        f"WITH isoq AS MATERIALIZED ({quality_sql()}),\n"
        "isol AS MATERIALIZED (\n"
        "  SELECT q.doc_id, q.quality,\n"
        f"    CASE WHEN d.lang = '{pl}' THEN 1 ELSE 0 END AS pos\n"
        "  FROM isoq q JOIN documents d USING (doc_id)),\n"
        "ison AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM isol),\n"
        "isob AS MATERIALIZED (\n"
        "  SELECT CAST(((row_number() OVER (ORDER BY quality, doc_id)"
        f" - 1) * {B})\n"
        "    // (SELECT nt FROM ison) + 1 AS INT) AS b, pos\n"
        "  FROM isol),\n"
        "isop AS MATERIALIZED (\n"
        "  SELECT b, CAST(count(*) AS BIGINT) AS n,\n"
        "    CAST(sum(pos) AS BIGINT) AS p FROM isob GROUP BY 1),\n"
        "isoa AS MATERIALIZED (\n"
        "  SELECT list(n ORDER BY b) AS ns, list(p ORDER BY b) AS ps,\n"
        "    list(b ORDER BY b) AS bs FROM isop),\n"
        "isoc AS MATERIALIZED (\n"
        "  SELECT bs, ns, ps,\n"
        "    list_transform(range(0, len(ns) + 1), i ->\n"
        "      CAST(COALESCE(list_sum(ns[1:i]), 0) AS BIGINT)) AS cn,\n"
        "    list_transform(range(0, len(ns) + 1), i ->\n"
        "      CAST(COALESCE(list_sum(ps[1:i]), 0) AS BIGINT)) AS cp\n"
        "  FROM isoa),\n"
        "isof AS MATERIALIZED (\n"
        "  SELECT bs, ns, ps,\n"
        "    list_transform(range(1, len(ns) + 1), i ->\n"
        "      list_max(list_transform(range(1, i + 1), j ->\n"
        "        list_min(list_transform(range(i, len(ns) + 1), k ->\n"
        "          (1000000 * (cp[k + 1] - cp[j])) //"
        " (cn[k + 1] - cn[j])\n"
        "        ))))) AS fit\n"
        "  FROM isoc)\n"
        "SELECT CAST(u.b AS INT) AS bucket,\n"
        "  CAST(u.n AS BIGINT) AS n, CAST(u.p AS BIGINT) AS pos,\n"
        "  CAST((1000000 * u.p) // u.n AS BIGINT) AS rate_micros,\n"
        "  CAST(u.f AS BIGINT) AS fitted_micros\n"
        "FROM (\n"
        "  SELECT unnest(bs) AS b, unnest(ns) AS n, unnest(ps) AS p,\n"
        "    unnest(fit) AS f FROM isof) u"
    )


def int8_quant_error_sql() -> str:
    """Mirror of operators.similarity.int8_quant_error, exploded per
    (vector, dim) — row-shaped where the Spark side is array-shaped,
    same integer semantics."""
    return (
        "WITH i8q AS MATERIALIZED (\n"
        "  SELECT vec_id,\n"
        "    list_transform(embedding, x ->"
        " CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv\n"
        "  FROM embeddings),\n"
        "i8e AS MATERIALIZED (\n"
        "  SELECT vec_id, i AS dim, qv[i] AS v\n"
        "  FROM i8q, unnest(range(1, len(qv) + 1)) AS t(i)),\n"
        "i8b AS MATERIALIZED (\n"
        "  SELECT dim, CAST(min(v) AS BIGINT) AS mn,\n"
        "    CAST(max(v) AS BIGINT) AS mx FROM i8e GROUP BY 1),\n"
        "i8err AS MATERIALIZED (\n"
        "  SELECT e.vec_id,\n"
        "    CASE WHEN b.mx > b.mn THEN e.v - (b.mn +\n"
        "      ((((e.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn))"
        " // 255)\n"
        "    ELSE 0 END AS err\n"
        "  FROM i8e e JOIN i8b b USING (dim)),\n"
        "i8d AS (SELECT CAST(max(dim) AS BIGINT) AS d FROM i8e)\n"
        "SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,\n"
        "  (SELECT d FROM i8d) AS dims,\n"
        "  CAST(sum(err * err) AS BIGINT) AS sum_sq_err,\n"
        "  CAST(max(abs(err)) AS BIGINT) AS max_abs_err,\n"
        "  CAST(sum(err * err) // (count(DISTINCT vec_id)"
        " * (SELECT d FROM i8d)) AS BIGINT) AS mean_sq_err\n"
        "FROM i8err"
    )


def pareto_frontier_sql() -> str:
    """Mirror of operators.analytics.pareto_frontier: per-unit (f, m),
    best-m per distinct f, running strict-larger-f max, semi-join
    back for point populations."""
    return (
        "WITH pfp AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS f,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS m\n"
        "  FROM events GROUP BY 1),\n"
        "pfb AS MATERIALIZED (SELECT f, CAST(max(m) AS BIGINT) AS bm\n"
        "  FROM pfp GROUP BY 1),\n"
        "pff AS MATERIALIZED (\n"
        "  SELECT f, bm FROM (\n"
        "    SELECT f, bm, max(bm) OVER (ORDER BY f DESC\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        " AS prev\n"
        "    FROM pfb)\n"
        "  WHERE prev IS NULL OR bm > prev)\n"
        "SELECT p.f, p.m, CAST(count(*) AS BIGINT) AS n_users\n"
        "FROM pfp p JOIN pff x ON x.f = p.f AND x.bm = p.m\n"
        "GROUP BY 1, 2"
    )


def scc_condensation_layers_sql(depth: int = 8) -> str:
    """Mirror of algos.scc.scc_condensation_layers over the transcript
    graph + one HALF-loop closure edge per conversation (mid turn →
    first turn: the first half collapses into one SCC, the tail stays
    a chain, so the condensation has real layers): exact recursive
    closure for the SCC labels (scc_sql's device), then the
    dag_layers_sql round rule unrolled over the contracted arcs."""
    parts = [
        "mide AS MATERIALIZED (\n"
        "  SELECT s.id AS src, d.id AS dst\n"
        "  FROM (SELECT conv_id, max(turn_idx) // 2 AS mid\n"
        "        FROM vertices GROUP BY 1) m\n"
        "  JOIN vertices s ON s.conv_id = m.conv_id"
        " AND s.turn_idx = m.mid\n"
        "  JOIN vertices d ON d.conv_id = m.conv_id"
        " AND d.turn_idx = 0)",
        "dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM edges\n"
        "  UNION ALL SELECT src, dst FROM mide\n"
        ") u WHERE src <> dst)",
        "fw(v, r) AS (\n"
        "  SELECT id, id FROM vertices\n"
        "  UNION\n"
        "  SELECT e.dst, fw.r FROM fw JOIN dedges e ON e.src = fw.v)",
        "sccl AS MATERIALIZED (\n"
        "  SELECT f.v AS id, CAST(min(f.r) AS BIGINT) AS scc\n"
        "  FROM fw f JOIN fw g ON g.v = f.r AND g.r = f.v\n"
        "  GROUP BY f.v)",
        "cmem AS MATERIALIZED (SELECT scc,"
        " CAST(count(*) AS BIGINT) AS members FROM sccl GROUP BY 1)",
        "cede AS MATERIALIZED (\n"
        "  SELECT DISTINCT s.scc AS src, d.scc AS dst\n"
        "  FROM dedges e JOIN sccl s ON s.id = e.src\n"
        "  JOIN sccl d ON d.id = e.dst WHERE s.scc <> d.scc)",
        "cd0 AS MATERIALIZED (SELECT scc AS id,"
        " CAST(0 AS BIGINT) AS layer FROM cmem)",
    ]
    for k in range(1, depth + 1):
        prev = f"cd{k - 1}"
        parts.append(
            f"cd{k} AS MATERIALIZED (\n"
            f"  SELECT p.id,\n"
            f"    CAST(CASE WHEN m.d IS NOT NULL AND m.d > p.layer\n"
            f"         THEN m.d ELSE p.layer END AS BIGINT) AS layer\n"
            f"  FROM {prev} p LEFT JOIN (\n"
            f"    SELECT e.dst AS id, max(q.layer) + 1 AS d\n"
            f"    FROM cede e JOIN {prev} q ON q.id = e.src\n"
            f"    GROUP BY e.dst) m ON m.id = p.id)"
        )
    body = (
        ", " + ",\n".join(parts) + "\n"
        "SELECT c.id AS scc, m.members, c.layer\n"
        f"FROM cd{depth} c JOIN cmem m ON m.scc = c.id"
    )
    return _graph_query(body, recursive=True)


def bounce_rate_sql(gap_minutes: int = 30) -> str:
    """Mirror of operators.sessions.bounce_rate over the sessionize
    oracle's session table."""
    return (
        f"WITH bs AS MATERIALIZED ({sessionize_sql(gap_minutes)})\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_sessions,\n"
        "  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_bounces,\n"
        "  CAST((1000000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0"
        " END)) // count(*) AS BIGINT) AS bounce_micros,\n"
        "  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,\n"
        "  CAST(max(n_events) AS BIGINT) AS max_session_events\n"
        "FROM bs"
    )


def embedding_distance_profile_sql(
    num_groups: int = 64, salt: str = "edp"
) -> str:
    """Mirror of operators.similarity.embedding_distance_profile:
    hash-bucket rank pairing, exact micro² squared distances, the
    shared discrete-rank quantiles over one group."""
    G = int(num_groups)
    h = _h48(f"'{salt}:' || CAST(vec_id AS VARCHAR)")
    picks = ",\n".join(
        f"  CAST(max(CASE WHEN rn = (n * {p} + 99) // 100"
        f" THEN d2 END) AS BIGINT) AS p{p}"
        for p in (25, 50, 75)
    )
    return (
        "WITH edq AS MATERIALIZED (\n"
        "  SELECT vec_id,\n"
        "    list_transform(embedding, x ->"
        " CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv,\n"
        f"    {h} % {G} AS g\n"
        "  FROM embeddings),\n"
        "edr AS MATERIALIZED (\n"
        "  SELECT g, (row_number() OVER (PARTITION BY g ORDER BY"
        " vec_id) - 1) // 2 AS pair, qv\n"
        "  FROM edq),\n"
        "edp AS MATERIALIZED (\n"
        "  SELECT g, pair, CAST(list_sum(list_transform(\n"
        "    range(1, len(min(qv)) + 1),\n"
        "    i -> (min(qv)[i] - max(qv)[i])\n"
        "      * (min(qv)[i] - max(qv)[i])\n"
        "  )) AS BIGINT) AS d2\n"
        "  FROM edr GROUP BY g, pair HAVING count(*) = 2),\n"
        "edrk AS MATERIALIZED (\n"
        "  SELECT d2, row_number() OVER (ORDER BY d2) AS rn,\n"
        "    count(*) OVER () AS n FROM edp)\n"
        "SELECT CAST(max(n) AS BIGINT) AS n_pairs,\n"
        f"{picks}\n"
        "FROM edrk HAVING count(*) > 0"
    )


def touch_attribution_sql(convert_type: str = "purchase") -> str:
    """Mirror of operators.temporal.touch_attribution: one ordered
    window carrying first/last non-conversion touch (IGNORE NULLS over
    the strictly-preceding frame — measured identical to Spark's
    ignorenulls), per-model codebook groupBys unioned."""
    cv = convert_type.replace("'", "''")
    return (
        "WITH tam AS MATERIALIZED (\n"
        "  SELECT event_type,\n"
        "    CAST(round(value * 100) AS BIGINT) AS cents,\n"
        f"    first_value(CASE WHEN event_type <> '{cv}'"
        " THEN event_type END IGNORE NULLS) OVER w AS ft,\n"
        f"    last_value(CASE WHEN event_type <> '{cv}'"
        " THEN event_type END IGNORE NULLS) OVER w AS lt\n"
        "  FROM events\n"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),\n"
        "tac AS MATERIALIZED (SELECT * FROM tam"
        f" WHERE event_type = '{cv}')\n"
        "SELECT 'first_touch' AS model,\n"
        "  COALESCE(ft, '(direct)') AS channel,\n"
        "  CAST(count(*) AS BIGINT) AS n_conversions,\n"
        "  CAST(sum(cents) AS BIGINT) AS sum_cents\n"
        "FROM tac GROUP BY 2\n"
        "UNION ALL\n"
        "SELECT 'last_touch', COALESCE(lt, '(direct)'),\n"
        "  CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)\n"
        "FROM tac GROUP BY 2"
    )


def dose_response_sql(
    exposure_type: str = "view",
    outcome_type: str = "purchase",
    max_bucket: int = 3,
) -> str:
    """Mirror of operators.analytics.dose_response."""
    ex = exposure_type.replace("'", "''")
    oc = outcome_type.replace("'", "''")
    return (
        "WITH drp AS MATERIALIZED (\n"
        "  SELECT user_id,\n"
        f"    CAST(sum(CASE WHEN event_type = '{ex}' THEN 1 ELSE 0"
        " END) AS BIGINT) AS x,\n"
        f"    max(CASE WHEN event_type = '{oc}' THEN 1 ELSE 0 END)"
        " AS y\n"
        "  FROM events GROUP BY 1)\n"
        f"SELECT CAST(least(x, {int(max_bucket)}) AS INT)"
        " AS exposure_bucket,\n"
        "  CAST(count(*) AS BIGINT) AS n_units,\n"
        "  CAST(sum(y) AS BIGINT) AS n_converted,\n"
        "  CAST((1000000 * sum(y)) // count(*) AS BIGINT)"
        " AS rate_micros\n"
        "FROM drp GROUP BY 1"
    )


def popularity_hitrate_sql(k: int = 2) -> str:
    """Mirror of operators.analytics.popularity_hitrate: last event per
    unit held out, train-frequency top-k (ties item asc), hit share."""
    return (
        "WITH phm AS MATERIALIZED (\n"
        "  SELECT user_id AS u, event_type AS it,\n"
        "    CASE WHEN row_number() OVER (PARTITION BY user_id\n"
        "      ORDER BY ts DESC, event_id DESC) = 1 THEN 1 ELSE 0 END"
        " AS held\n"
        "  FROM events),\n"
        "pht AS MATERIALIZED (SELECT it FROM (\n"
        "  SELECT it, CAST(count(*) AS BIGINT) AS n FROM phm\n"
        "  WHERE held = 0 GROUP BY 1)\n"
        f"  ORDER BY n DESC, it LIMIT {int(k)}),\n"
        "phh AS MATERIALIZED (SELECT u, it FROM phm WHERE held = 1),\n"
        "pha AS (SELECT CAST(count(*) AS BIGINT) AS n_users"
        " FROM phh),\n"
        "phb AS (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM phh\n"
        "  WHERE it IN (SELECT it FROM pht))\n"
        "SELECT n_users, n_hits,\n"
        "  CAST((1000000 * n_hits) // n_users AS BIGINT)"
        " AS hitrate_micros\n"
        "FROM pha, phb"
    )


def psi_time_drift_sql(group_col: str = "event_type") -> str:
    """Mirror of operators.analytics.psi_time_drift: midpoint-of-range
    halves, 1-count floors on absent sides, identical float PSI term
    rounded once."""
    return (
        "WITH psr AS (SELECT min(CAST(epoch_us(ts) AS BIGINT)) AS lo,\n"
        "  max(CAST(epoch_us(ts) AS BIGINT)) AS hi FROM events),\n"
        "psh AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,\n"
        "    CASE WHEN CAST(epoch_us(ts) AS BIGINT) >=\n"
        "      (SELECT lo + (hi - lo) // 2 + 1 FROM psr)\n"
        "    THEN 1 ELSE 0 END AS late\n"
        "  FROM events),\n"
        "psp AS MATERIALIZED (SELECT g,\n"
        "  CAST(sum(1 - late) AS BIGINT) AS n_early,\n"
        "  CAST(sum(late) AS BIGINT) AS n_late FROM psh GROUP BY 1),\n"
        "pst AS (SELECT CAST(sum(n_early) AS BIGINT) AS te,\n"
        "  CAST(sum(n_late) AS BIGINT) AS tl FROM psp)\n"
        f"SELECT g AS {group_col}, n_early, n_late,\n"
        "  CAST((1000000 * n_early) // te AS BIGINT)"
        " AS share_early_micros,\n"
        "  CAST((1000000 * n_late) // tl AS BIGINT)"
        " AS share_late_micros,\n"
        "  CAST(round(1000000.0 * (greatest(n_late, 1) / tl\n"
        "      - greatest(n_early, 1) / te)\n"
        "    * ln((greatest(n_late, 1) / tl)\n"
        "      / (greatest(n_early, 1) / te)), 0) AS BIGINT)"
        " AS psi_contrib_micros\n"
        "FROM psp, pst"
    )


def knn_accuracy_sql() -> str:
    """Mirror of operators.similarity.knn_accuracy: leave-one-out 1-NN
    by the shared rounded cosine + (sim DESC, neighbor ASC) rank."""
    return (
        f"WITH {_EMB_D},\n"
        "el AS MATERIALIZED (SELECT vec_id, label FROM embeddings),\n"
        "scored AS MATERIALIZED (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
        f" {_COS} AS sim\n"
        "  FROM e q JOIN e c ON c.vec_id <> q.vec_id),\n"
        "top1 AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        "    SELECT *, row_number() OVER (PARTITION BY query_id\n"
        "      ORDER BY sim DESC, neighbor_id ASC) AS rk FROM scored)\n"
        "  WHERE rk = 1)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_vecs,\n"
        "  CAST(sum(CASE WHEN tl.label = pl.label THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_correct,\n"
        "  CAST((1000000 * sum(CASE WHEN tl.label = pl.label THEN 1"
        " ELSE 0 END)) // count(*) AS BIGINT) AS accuracy_micros\n"
        "FROM top1 t JOIN el tl ON tl.vec_id = t.query_id\n"
        "JOIN el pl ON pl.vec_id = t.neighbor_id"
    )


def minhash_estimate_error_sql(
    num_hashes: int = 8, bands: int = 4
) -> str:
    """Mirror of operators.dedup.minhash_estimate_error over the
    shared MinHash-LSH CTE chain: matching-component micro estimate vs
    the exact integer shingle Jaccard, summarized."""
    K = int(num_hashes)
    m = " + ".join(
        f"CASE WHEN sa.h{k} = sb.h{k} THEN 1 ELSE 0 END"
        for k in range(K)
    )
    return (
        f"WITH {_minhash_lsh_ctes(num_hashes, bands)},\n"
        "meest AS MATERIALIZED (\n"
        "  SELECT cand.a, cand.b,\n"
        f"    CAST((({m}) * 1000000) // {K} AS BIGINT) AS est_micros\n"
        "  FROM cand JOIN sig sa ON sa.doc_id = cand.a\n"
        "  JOIN sig sb ON sb.doc_id = cand.b),\n"
        "meex AS MATERIALIZED (\n"
        "  SELECT cand.a, cand.b,\n"
        "    CAST((1000000 * COALESCE(i.c, 0))\n"
        "      // (za.n_sh + zb.n_sh - COALESCE(i.c, 0)) AS BIGINT)"
        " AS ex_micros\n"
        "  FROM cand LEFT JOIN inter i"
        " ON i.a = cand.a AND i.b = cand.b\n"
        "  JOIN sizes za ON za.doc_id = cand.a\n"
        "  JOIN sizes zb ON zb.doc_id = cand.b),\n"
        "meper AS MATERIALIZED (\n"
        "  SELECT abs(e.est_micros - x.ex_micros) AS ae,\n"
        "    e.est_micros, x.ex_micros\n"
        "  FROM meest e JOIN meex x ON x.a = e.a AND x.b = e.b)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs,\n"
        "  CAST(sum(ae) // count(*) AS BIGINT)"
        " AS mean_abs_err_micros,\n"
        "  CAST(max(ae) AS BIGINT) AS max_abs_err_micros,\n"
        "  CAST(sum(est_micros) // count(*) AS BIGINT)"
        " AS mean_est_micros,\n"
        "  CAST(sum(ex_micros) // count(*) AS BIGINT)"
        " AS mean_exact_micros\n"
        "FROM meper"
    )


def distinctive_terms_logodds_sql(k: int = 5) -> str:
    """Mirror of operators.tfidf.distinctive_terms_logodds: identical
    integer counts, the identical one-float z expression, the
    (z DESC, token ASC) per-source top-k."""
    return (
        f"WITH {TOKS_CTE},\n"
        "dtc AS MATERIALIZED (\n"
        "  SELECT d.source, u.tok, CAST(count(*) AS BIGINT) AS cs\n"
        "  FROM toks_t t JOIN documents d USING (doc_id),\n"
        "    unnest(t.toks) AS u(tok)\n"
        "  GROUP BY 1, 2),\n"
        "dtt AS MATERIALIZED (SELECT tok,"
        " CAST(sum(cs) AS BIGINT) AS ct FROM dtc GROUP BY 1),\n"
        "dts AS MATERIALIZED (SELECT source,"
        " CAST(sum(cs) AS BIGINT) AS ns FROM dtc GROUP BY 1),\n"
        "dtg AS (SELECT CAST(sum(cs) AS BIGINT) AS nn,\n"
        "  CAST(count(DISTINCT tok) AS BIGINT) AS vv FROM dtc),\n"
        "dtz AS MATERIALIZED (\n"
        "  SELECT c.source, c.tok AS token, c.cs AS c_source,\n"
        "    round((ln((c.cs + 1) / (s.ns + g.vv - c.cs - 1))\n"
        "      - ln((t.ct - c.cs + 1)\n"
        "          / (g.nn - s.ns + g.vv - (t.ct - c.cs) - 1)))\n"
        "      / sqrt(1.0 / (c.cs + 1) + 1.0 / (t.ct - c.cs + 1)), 6)"
        " AS z\n"
        "  FROM dtc c JOIN dtt t USING (tok) JOIN dts s USING (source)"
        ", dtg g)\n"
        "SELECT source, token, c_source, z FROM (\n"
        "  SELECT *, row_number() OVER (PARTITION BY source\n"
        "    ORDER BY z DESC, token ASC) AS rk FROM dtz)\n"
        f"WHERE rk <= {int(k)}"
    )


def textrank_top_sentence_sql(iterations: int = 4) -> str:
    """Mirror of operators.tfidf.textrank_top_sentence: [.!?]+
    sentence split with original positions, distinct-token overlap
    weights within doc, the damped integer power iteration unrolled,
    (score DESC, idx ASC) top-1 per doc."""
    parts = [
        "txp AS MATERIALIZED (SELECT doc_id,\n"
        "  string_split_regex(text, '[.!?]+') AS parts"
        " FROM documents)",
        "txs AS MATERIALIZED (\n"
        "  SELECT doc_id, i - 1 AS sent_idx,\n"
        "    list_distinct(list_filter(\n"
        "      string_split_regex(lower(parts[i]), '\\s+'),"
        " x -> x <> '')) AS toks\n"
        "  FROM txp, unnest(range(1, len(parts) + 1)) AS t(i))",
        "txn AS MATERIALIZED (SELECT doc_id, sent_idx FROM txs"
        " WHERE len(toks) > 0)",
        "txt AS MATERIALIZED (\n"
        "  SELECT s.doc_id, s.sent_idx, u.tok\n"
        "  FROM txs s, unnest(s.toks) AS u(tok)"
        " WHERE len(s.toks) > 0)",
        "txw AS MATERIALIZED (\n"
        "  SELECT x.doc_id, x.sent_idx AS src, y.sent_idx AS dst,\n"
        "    CAST(count(*) AS BIGINT) AS w\n"
        "  FROM txt x JOIN txt y ON y.doc_id = x.doc_id\n"
        "    AND y.tok = x.tok AND y.sent_idx <> x.sent_idx\n"
        "  GROUP BY 1, 2, 3)",
        "txo AS MATERIALIZED (SELECT doc_id, src,"
        " CAST(sum(w) AS BIGINT) AS wt FROM txw GROUP BY 1, 2)",
        "txe AS MATERIALIZED (SELECT w.doc_id, w.src, w.dst, w.w,"
        " o.wt\n"
        "  FROM txw w JOIN txo o ON o.doc_id = w.doc_id"
        " AND o.src = w.src)",
        "txr0 AS MATERIALIZED (SELECT doc_id, sent_idx,\n"
        "  CAST(1000000 AS BIGINT) AS r FROM txn)",
    ]
    for k in range(1, iterations + 1):
        prev = f"txr{k - 1}"
        parts.append(
            f"txr{k} AS MATERIALIZED (\n"
            "  SELECT n.doc_id, n.sent_idx,\n"
            "    CAST(150000 + (85 * COALESCE(m.s, 0)) // 100"
            " AS BIGINT) AS r\n"
            "  FROM txn n LEFT JOIN (\n"
            "    SELECT e.doc_id, e.dst AS sent_idx,\n"
            "      CAST(sum((q.r * e.w) // e.wt) AS BIGINT) AS s\n"
            f"    FROM txe e JOIN {prev} q ON q.doc_id = e.doc_id\n"
            "      AND q.sent_idx = e.src\n"
            "    GROUP BY 1, 2) m ON m.doc_id = n.doc_id\n"
            "    AND m.sent_idx = n.sent_idx)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "txcnt AS MATERIALIZED (SELECT doc_id,"
        " CAST(count(*) AS BIGINT) AS n_sentences\n"
        "  FROM txn GROUP BY 1),\n"
        "txtop AS MATERIALIZED (\n"
        "  SELECT doc_id, sent_idx, r AS score_micros FROM (\n"
        f"    SELECT *, row_number() OVER (PARTITION BY doc_id\n"
        f"      ORDER BY r DESC, sent_idx ASC) AS rk FROM"
        f" txr{iterations})\n"
        "  WHERE rk = 1)\n"
        "SELECT c.doc_id, c.n_sentences,\n"
        "  CAST(t.sent_idx AS INT) AS sent_idx, t.score_micros\n"
        "FROM txcnt c JOIN txtop t USING (doc_id)"
    )


def ols_user_value_sql() -> str:
    """Mirror of operators.analytics.ols_user_value: exact BIGINT
    moments, HUGEINT slope/intercept micros (== Spark DECIMAL(38,0)
    div), the one float R² over the same exact operands."""
    num = "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy"
    den = "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx"
    deny = "CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy"
    slope = f"(({num}) * 1000000) // ({den})"
    return (
        "WITH ouv AS MATERIALIZED (\n"
        "  SELECT user_id, CAST(count(*) AS BIGINT) AS x,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS y\n"
        "  FROM events GROUP BY 1),\n"
        "oum AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT)"
        " AS sy,\n"
        "  CAST(sum(x * y) AS BIGINT) AS sxy,\n"
        "  CAST(sum(x * x) AS BIGINT) AS sxx,\n"
        "  CAST(sum(y * y) AS BIGINT) AS syy FROM ouv)\n"
        "SELECT n,\n"
        f"  CAST({slope} AS BIGINT) AS slope_micros,\n"
        f"  CAST((CAST(sy AS HUGEINT) * 1000000 - ({slope}) * sx)\n"
        "    // CAST(n AS HUGEINT) AS BIGINT) AS intercept_micros,\n"
        f"  CASE WHEN ({den}) > 0 AND ({deny}) > 0 THEN\n"
        f"    round(CAST(({num}) AS DOUBLE) * CAST(({num}) AS DOUBLE)\n"
        f"      / (CAST(({den}) AS DOUBLE) * CAST(({deny}) AS"
        " DOUBLE)), 6)\n"
        "  END AS r2\n"
        "FROM oum"
    )


def max_streak_hist_sql() -> str:
    """Mirror of operators.analytics.max_streak_hist: gaps-and-islands
    per unit, longest run, histogram."""
    return (
        "WITH msp AS MATERIALIZED (SELECT DISTINCT user_id AS u,\n"
        "  CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d"
        " FROM events),\n"
        "msi AS MATERIALIZED (SELECT u,\n"
        "  d - row_number() OVER (PARTITION BY u ORDER BY d) AS isl\n"
        "  FROM msp),\n"
        "msr AS MATERIALIZED (SELECT u, isl,"
        " CAST(count(*) AS BIGINT) AS len FROM msi GROUP BY 1, 2),\n"
        "msm AS MATERIALIZED (SELECT u,"
        " CAST(max(len) AS BIGINT) AS streak_days FROM msr"
        " GROUP BY 1)\n"
        "SELECT streak_days, CAST(count(*) AS BIGINT) AS n_users\n"
        "FROM msm GROUP BY 1"
    )


def median_two_pass_sql(group_col: str = "event_type") -> str:
    """DEFINITIONAL oracle for operators.quantiles.median_two_pass:
    the plain single-sort lower median at rank ceil(n/2) — the Spark
    side's two-pass histogram algorithm must land on the same value,
    so the green row proves the algorithm."""
    return (
        "WITH m2c AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,"
        " CAST(round(value * 100) AS BIGINT) AS c FROM events),\n"
        "m2r AS MATERIALIZED (\n"
        "  SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c)"
        " AS rn,\n"
        "    count(*) OVER (PARTITION BY g) AS n FROM m2c)\n"
        f"SELECT g AS {group_col}, CAST(n AS BIGINT) AS n,\n"
        "  c AS median_cents\n"
        "FROM m2r WHERE rn = (n + n % 2) // 2"
    )


def markov_entropy_rate_sql() -> str:
    """Mirror of operators.cooccurrence.markov_entropy_rate: per-actor
    lag transitions, per-state conditional entropy as an IN-ORDER
    list_reduce fold (== Spark's sorted-array aggregate — identical
    float accumulation sequence), micros once."""
    term = (
        "-(x / CAST(na AS DOUBLE)) * log2(x / CAST(na AS DOUBLE))"
    )
    return (
        "WITH mep AS MATERIALIZED (\n"
        "  SELECT lag(event_type) OVER (PARTITION BY user_id\n"
        "    ORDER BY ts, event_id) AS a, event_type AS b"
        " FROM events),\n"
        "mec AS MATERIALIZED (SELECT a, b,"
        " CAST(count(*) AS BIGINT) AS n\n"
        "  FROM mep WHERE a IS NOT NULL GROUP BY 1, 2),\n"
        "met AS MATERIALIZED (SELECT a,"
        " CAST(sum(n) AS BIGINT) AS na FROM mec GROUP BY 1),\n"
        "meg AS (SELECT CAST(sum(na) AS BIGINT) AS nn FROM met),\n"
        "mea AS MATERIALIZED (\n"
        "  SELECT c.a, t.na, list(c.n ORDER BY c.b) AS ns\n"
        "  FROM mec c JOIN met t USING (a) GROUP BY c.a, t.na),\n"
        "meh AS MATERIALIZED (\n"
        "  SELECT a, na,\n"
        f"    list_reduce(list_transform(ns, x -> {term}),\n"
        "      (p, q) -> p + q) AS hc\n"
        "  FROM mea)\n"
        "SELECT a AS state, na AS n_from,\n"
        "  CAST(round(1000000.0 * hc, 0) AS BIGINT) AS h_cond_micros,\n"
        "  CAST((1000000 * na) // (SELECT nn FROM meg) AS BIGINT)"
        " AS p_state_micros,\n"
        "  CAST(round(1000000.0 * (CAST(na AS DOUBLE)"
        " / (SELECT nn FROM meg)) * hc, 0) AS BIGINT)"
        " AS contrib_micros\n"
        "FROM meh"
    )


def daily_peak_concurrency_sql(gap_minutes: int = 30) -> str:
    """Mirror of operators.sessions.daily_peak_concurrency: sessionize
    oracle, day clipping (midnight-spanning sessions count in each
    day), ±1 sweep with (+1 before −1) tie order, per-day running
    max."""
    DAY = 86400 * 1_000_000
    return (
        f"WITH pcs AS MATERIALIZED ({sessionize_sql(gap_minutes)}),\n"
        "pcc AS MATERIALIZED (\n"
        "  SELECT s.start_us, s.end_us, d.day\n"
        f"  FROM pcs s, unnest(range(s.start_us // {DAY},\n"
        f"    s.end_us // {DAY} + 1)) AS d(day)),\n"
        "pcd AS MATERIALIZED (\n"
        f"  SELECT day, greatest(start_us, day * {DAY}) AS t,\n"
        "    1 AS delta FROM pcc\n"
        "  UNION ALL\n"
        f"  SELECT day, least(end_us, (day + 1) * {DAY} - 1) + 1,\n"
        "    -1 FROM pcc),\n"
        "pcr AS MATERIALIZED (\n"
        "  SELECT day, sum(delta) OVER (PARTITION BY day\n"
        "    ORDER BY t, delta DESC ROWS BETWEEN UNBOUNDED PRECEDING\n"
        "    AND CURRENT ROW) AS open FROM pcd)\n"
        "SELECT day, CAST(max(open) AS BIGINT) AS peak_concurrent\n"
        "FROM pcr GROUP BY 1"
    )


def session_entry_exit_sql(gap_minutes: int = 30) -> str:
    """Mirror of operators.sessions.session_entry_exit: the sessionize
    marking windows plus per-session first/last event types."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        "WITH sem AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS ts_us,"
        " event_id, event_type,\n"
        "    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL\n"
        f"      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}\n"
        "      THEN 1 ELSE 0 END AS is_new\n"
        "  FROM events\n"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),\n"
        "ses AS MATERIALIZED (\n"
        "  SELECT u, ts_us, event_id, event_type,\n"
        "    sum(is_new) OVER (PARTITION BY u ORDER BY ts_us,"
        " event_id) AS session_seq\n"
        "  FROM sem),\n"
        "sep AS MATERIALIZED (\n"
        "  SELECT DISTINCT u, session_seq,\n"
        "    first_value(event_type) OVER w2 AS entry_type,\n"
        "    last_value(event_type) OVER w2 AS exit_type\n"
        "  FROM ses\n"
        "  WINDOW w2 AS (PARTITION BY u, session_seq\n"
        "    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND UNBOUNDED FOLLOWING))\n"
        "SELECT entry_type, exit_type,"
        " CAST(count(*) AS BIGINT) AS n_sessions\n"
        "FROM sep GROUP BY 1, 2"
    )


def revenue_var_sql(pct: int = 5) -> str:
    """Mirror of operators.analytics.revenue_var: zero-filled daily
    revenue, the shared rank rule with the min-1 floor, floor-mod
    truncating tail mean."""
    p = int(pct)
    return (
        "WITH rvd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS cents\n"
        "  FROM events GROUP BY 1),\n"
        "rvr AS (SELECT min(d) AS lo, max(d) AS hi FROM rvd),\n"
        "rvf AS MATERIALIZED (\n"
        "  SELECT CAST(COALESCE(e.cents, 0) AS BIGINT) AS c\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM rvr) s\n"
        "  LEFT JOIN rvd e USING (d)),\n"
        "rvk AS MATERIALIZED (\n"
        "  SELECT c, row_number() OVER (ORDER BY c) AS rn,\n"
        "    count(*) OVER () AS n FROM rvf),\n"
        "rvt AS MATERIALIZED (SELECT * FROM rvk\n"
        f"  WHERE rn <= greatest((n * {p}) // 100, 1))\n"
        "SELECT CAST(max(n) AS BIGINT) AS n_days,\n"
        f"  CAST(max(CASE WHEN rn = greatest((n * {p}) // 100, 1)"
        " THEN c END) AS BIGINT) AS var_cents,\n"
        "  CAST((sum(c) - (sum(c) % count(*) + count(*))"
        " % count(*)) // count(*) AS BIGINT) AS es_cents\n"
        "FROM rvt"
    )


def vertex_cover_sql(max_rounds: int = 16) -> str:
    """Mirror of algos.matching.vertex_cover_2approx: the full
    maximal-matching oracle embedded as a nested-WITH CTE (the
    curate_pack device), both endpoints counted, plus the
    self-verification count of edges with two unmatched endpoints."""
    # splice the matching oracle's CTE chain (DuckDB rejects duplicate
    # CTE aliases even in nested scopes, so the GRAPH_CTES prefix is
    # stripped and the final SELECT becomes the vcm CTE body)
    inner = matching_sql(max_rounds)
    prefix = f"WITH {GRAPH_CTES}\n"
    assert inner.startswith(prefix)
    inner_body = inner[len(prefix):]
    ctes, final_select = inner_body.rsplit("\nSELECT", 1)
    body = (
        f"{ctes},\n"
        f"vcm AS MATERIALIZED (SELECT{final_select}),\n"
        "vcu AS MATERIALIZED (SELECT src, dst FROM und"
        " WHERE src < dst),\n"
        "vcq AS (SELECT CAST(count(*) AS BIGINT) AS n_unc\n"
        "  FROM vcu u JOIN vcm a ON a.id = u.src\n"
        "  JOIN vcm b ON b.id = u.dst\n"
        "  WHERE a.mate = -1 AND b.mate = -1)\n"
        "SELECT\n"
        "  (SELECT CAST(count(*) AS BIGINT) FROM vcm) AS n_vertices,\n"
        "  (SELECT CAST(sum(CASE WHEN mate >= 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) FROM vcm) AS n_cover,\n"
        "  (SELECT CAST(sum(CASE WHEN mate >= 0 THEN 1 ELSE 0 END)"
        " // 2 AS BIGINT) FROM vcm) AS n_matched_edges,\n"
        "  (SELECT n_unc FROM vcq) AS n_uncovered_edges"
    )
    return _graph_query(body)


def position_attribution_sql(convert_type: str = "purchase") -> str:
    """Mirror of operators.temporal.position_attribution: ordered
    preceding touch lists (DuckDB window list() keeps NULLs — filtered
    to match Spark's null-skipping collect_list), the 40/20/40 credit
    rule with the remainder on the last touch, exact micro-cents."""
    cv = convert_type.replace("'", "''")
    return (
        "WITH pam AS MATERIALIZED (\n"
        "  SELECT event_type,"
        " CAST(round(value * 100) AS BIGINT) AS cents,\n"
        "    list_filter(COALESCE(\n"
        f"      list(CASE WHEN event_type <> '{cv}' THEN event_type"
        " END) OVER w, []), x -> x IS NOT NULL) AS touches\n"
        "  FROM events\n"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),\n"
        "pac AS MATERIALIZED (SELECT cents, touches,"
        " len(touches) AS m FROM pam\n"
        f"  WHERE event_type = '{cv}' AND len(touches) > 0),\n"
        "pax AS MATERIALIZED (\n"
        "  SELECT cents, touches[i] AS channel,\n"
        "    CAST(CASE WHEN m = 1 THEN 1000000\n"
        "      WHEN m = 2 THEN 500000\n"
        "      WHEN i = 1 THEN 400000\n"
        "      WHEN i = m THEN 400000 + (200000\n"
        "        - (200000 // (m - 2)) * (m - 2))\n"
        "      ELSE 200000 // (m - 2) END AS BIGINT) AS credit\n"
        "  FROM pac, unnest(range(1, m + 1)) AS t(i))\n"
        "SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,\n"
        "  CAST(sum(cents * credit) AS BIGINT)"
        " AS sum_credit_microcents\n"
        "FROM pax GROUP BY 1"
    )


def max_nonoverlap_sessions_sql(gap_minutes: int = 30) -> str:
    """Mirror of operators.sessions.max_nonoverlap_sessions: the
    greedy earliest-end-first replayed as a per-unit recursive CTE in
    the identical (end, start, seq) order."""
    return (
        "WITH RECURSIVE mns AS MATERIALIZED ("
        + sessionize_sql(gap_minutes)
        + "),\n"
        "mnr AS MATERIALIZED (\n"
        "  SELECT user_id AS u, start_us, end_us,\n"
        "    row_number() OVER (PARTITION BY user_id\n"
        "      ORDER BY end_us, start_us, session_seq) AS rn\n"
        "  FROM mns),\n"
        "mnm AS MATERIALIZED (SELECT u, max(rn) AS mx FROM mnr"
        " GROUP BY 1),\n"
        "mng(u, i, cnt, last_end) AS (\n"
        "  SELECT u, CAST(1 AS BIGINT), CAST(1 AS BIGINT),"
        " CAST(end_us AS BIGINT)\n"
        "  FROM mnr WHERE rn = 1\n"
        "  UNION ALL\n"
        "  SELECT r.u, r.rn,\n"
        "    CASE WHEN r.start_us > g.last_end THEN g.cnt + 1"
        " ELSE g.cnt END,\n"
        "    CASE WHEN r.start_us > g.last_end THEN r.end_us"
        " ELSE g.last_end END\n"
        "  FROM mng g JOIN mnr r ON r.u = g.u AND r.rn = g.i + 1)\n"
        "SELECT CAST(g.cnt AS BIGINT) AS k_selected,\n"
        "  CAST(count(*) AS BIGINT) AS n_users\n"
        "FROM mng g JOIN mnm m ON m.u = g.u AND m.mx = g.i\n"
        "GROUP BY 1"
    )


def knn_hubness_sql() -> str:
    """Mirror of operators.similarity.knn_hubness: shared rounded
    cosine top-1, indegree histogram incl. the zero class."""
    return (
        f"WITH {_EMB_D},\n"
        "scored AS MATERIALIZED (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
        f" {_COS} AS sim\n"
        "  FROM e q JOIN e c ON c.vec_id <> q.vec_id),\n"
        "top1 AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        "    SELECT *, row_number() OVER (PARTITION BY query_id\n"
        "      ORDER BY sim DESC, neighbor_id ASC) AS rk FROM scored)\n"
        "  WHERE rk = 1),\n"
        "indeg AS MATERIALIZED (SELECT neighbor_id AS id,\n"
        "  CAST(count(*) AS BIGINT) AS d FROM top1 GROUP BY 1)\n"
        "SELECT CAST(COALESCE(i.d, 0) AS BIGINT) AS nn_indegree,\n"
        "  CAST(count(*) AS BIGINT) AS n_vecs\n"
        "FROM e LEFT JOIN indeg i ON i.id = e.vec_id GROUP BY 1"
    )


def knn_mutuality_sql() -> str:
    """Mirror of operators.similarity.knn_mutuality."""
    return (
        f"WITH {_EMB_D},\n"
        "scored AS MATERIALIZED (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
        f" {_COS} AS sim\n"
        "  FROM e q JOIN e c ON c.vec_id <> q.vec_id),\n"
        "top1 AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        "    SELECT *, row_number() OVER (PARTITION BY query_id\n"
        "      ORDER BY sim DESC, neighbor_id ASC) AS rk FROM scored)\n"
        "  WHERE rk = 1),\n"
        "mu AS (SELECT CAST(count(*) AS BIGINT) AS n_mutual\n"
        "  FROM top1 t JOIN top1 r ON r.query_id = t.neighbor_id\n"
        "  AND r.neighbor_id = t.query_id)\n"
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM top1)"
        " AS n_vecs,\n"
        "  (SELECT n_mutual FROM mu) AS n_mutual,\n"
        "  CAST((1000000 * (SELECT n_mutual FROM mu))\n"
        "    // (SELECT count(*) FROM top1) AS BIGINT)"
        " AS mutual_micros"
    )


def aa_hash_test_sql(
    convert_type: str = "purchase", salt: str = "aa"
) -> str:
    """Mirror of operators.analytics.aa_hash_test: hash48-parity split,
    the shared two-proportion z structure."""
    cv = convert_type.replace("'", "''")
    h = _h48(f"'{salt}:' || CAST(u AS VARCHAR)")
    pa = "(conv_a / n_a)"
    pb = "(conv_b / n_b)"
    pp = "((conv_a + conv_b) / (n_a + n_b))"
    z = (
        f"({pa} - {pb}) / sqrt({pp} * (1 - {pp})"
        " * (1.0 / n_a + 1.0 / n_b))"
    )
    return (
        "WITH aap AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        f"    max(CASE WHEN event_type = '{cv}' THEN 1 ELSE 0 END)"
        " AS c\n"
        "  FROM events GROUP BY 1),\n"
        "aah AS MATERIALIZED (SELECT\n"
        f"  CAST({h} % 2 AS INT) AS a, c FROM aap),\n"
        "aaa AS (SELECT CAST(sum(1 - a) AS BIGINT) AS n_a,\n"
        "  CAST(sum((1 - a) * c) AS BIGINT) AS conv_a,\n"
        "  CAST(sum(a) AS BIGINT) AS n_b,\n"
        "  CAST(sum(a * c) AS BIGINT) AS conv_b FROM aah)\n"
        "SELECT n_a, conv_a, n_b, conv_b,\n"
        f"  CASE WHEN n_a > 0 THEN round({pa}, 6) END AS rate_a,\n"
        f"  CASE WHEN n_b > 0 THEN round({pb}, 6) END AS rate_b,\n"
        "  CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0\n"
        "    AND conv_a + conv_b < n_a + n_b\n"
        f"  THEN round({z}, 6) END AS z\n"
        "FROM aaa"
    )


def cuped_adjustment_sql() -> str:
    """Mirror of operators.analytics.cuped_adjustment: midpoint split,
    integer-cents per-unit moments, one shared float expression."""
    covxy = "((n * sxy - sx * sy) / (n * n))"
    varx = "((n * sxx - sx * sx) / (n * n))"
    vary = "((n * syy - sy * sy) / (n * n))"
    theta = f"({covxy} / {varx})"
    var_adj = f"({vary} - {covxy} * {covxy} / {varx})"
    return (
        "WITH cus AS MATERIALIZED (SELECT user_id AS u,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS us,\n"
        "  CAST(round(value * 100) AS BIGINT) AS c FROM events),\n"
        "cum0 AS (SELECT CAST((min(us) + max(us)) // 2 AS BIGINT)"
        " AS mid FROM cus),\n"
        "cup AS MATERIALIZED (SELECT u,\n"
        "  CAST(COALESCE(sum(CASE WHEN us <= (SELECT mid FROM cum0)"
        " THEN c END), 0) AS BIGINT) AS x,\n"
        "  CAST(COALESCE(sum(CASE WHEN us > (SELECT mid FROM cum0)"
        " THEN c END), 0) AS BIGINT) AS y\n"
        "  FROM cus GROUP BY 1),\n"
        "cua AS (SELECT\n"
        "  CAST(count(*) AS DOUBLE) AS n,\n"
        "  CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,\n"
        "  CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,\n"
        "  CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,\n"
        "  CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy,\n"
        "  CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy,\n"
        "  CAST(count(*) AS BIGINT) AS n_units FROM cup)\n"
        "SELECT n_units,\n"
        f"  CASE WHEN {varx} > 0 THEN round({theta}, 6) END AS theta,\n"
        f"  CASE WHEN n > 0 THEN round({vary}, 6) END AS var_y,\n"
        f"  CASE WHEN {varx} > 0 THEN round({var_adj}, 6) END"
        " AS var_adj,\n"
        f"  CASE WHEN {varx} > 0 AND {vary} > 0\n"
        f"  THEN round(1.0 - {var_adj} / {vary}, 6) END AS reduction\n"
        "FROM cua"
    )


def ks_2sample_sql(
    type_a: str = "purchase", type_b: str = "click"
) -> str:
    """Mirror of operators.analytics.ks_2sample: value-alphabet ECDFs,
    exact cross-multiplied BIGINT numerator."""
    a = type_a.replace("'", "''")
    b = type_b.replace("'", "''")
    return (
        "WITH ksc AS MATERIALIZED (\n"
        f"  SELECT CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END"
        " AS is_a,\n"
        "    CAST(round(value * 100) AS BIGINT) AS v\n"
        f"  FROM events WHERE event_type IN ('{a}', '{b}')),\n"
        "ksp AS MATERIALIZED (SELECT v,"
        " CAST(count(*) AS BIGINT) AS cnt,\n"
        "  CAST(sum(is_a) AS BIGINT) AS cnt_a FROM ksc GROUP BY 1),\n"
        "ksw AS MATERIALIZED (SELECT\n"
        "  CAST(sum(cnt_a) OVER wo AS BIGINT) AS ca,\n"
        "  CAST(sum(cnt) OVER wo - sum(cnt_a) OVER wo AS BIGINT)"
        " AS cb\n"
        "  FROM ksp WINDOW wo AS (ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW)),\n"
        "kst AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,\n"
        "  CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b FROM ksp),\n"
        "ksa AS (SELECT\n"
        "  (SELECT n_a FROM kst) AS n_a,\n"
        "  (SELECT n_b FROM kst) AS n_b,\n"
        "  CAST(max(abs(ca * (SELECT n_b FROM kst)\n"
        "    - cb * (SELECT n_a FROM kst))) AS BIGINT) AS d_num\n"
        "  FROM ksw)\n"
        "SELECT n_a, n_b, d_num,\n"
        "  CASE WHEN n_a > 0 AND n_b > 0\n"
        "  THEN round(CAST(d_num AS DOUBLE)\n"
        "    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) END"
        " AS d_stat\n"
        "FROM ksa"
    )


def chi_square_type_dow_sql() -> str:
    """Mirror of operators.analytics.chi_square_type_dow: full
    observed-type x observed-dow lattice, exact micro-floored terms via
    the quotient/remainder split."""
    return (
        "WITH chs AS MATERIALIZED (SELECT event_type,\n"
        "  CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3) % 7"
        " AS INT) AS dow FROM events),\n"
        "chc AS MATERIALIZED (SELECT event_type, dow,"
        " CAST(count(*) AS BIGINT) AS o FROM chs GROUP BY 1, 2),\n"
        "chr AS MATERIALIZED (SELECT event_type,"
        " CAST(count(*) AS BIGINT) AS r FROM chs GROUP BY 1),\n"
        "chd AS MATERIALIZED (SELECT dow,"
        " CAST(count(*) AS BIGINT) AS c FROM chs GROUP BY 1),\n"
        "cht AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM chs),\n"
        "chl AS MATERIALIZED (SELECT rr.event_type, dd.dow, rr.r,"
        " dd.c,\n"
        "  (SELECT nn FROM cht) AS nn,\n"
        "  CAST(COALESCE(cc.o, 0) AS BIGINT) AS o\n"
        "  FROM chr rr CROSS JOIN chd dd\n"
        "  LEFT JOIN chc cc ON cc.event_type = rr.event_type"
        " AND cc.dow = dd.dow),\n"
        "chm AS MATERIALIZED (SELECT event_type, dow,\n"
        "  CAST((nn * o - r * c) * (nn * o - r * c) AS BIGINT)"
        " AS asq,\n"
        "  CAST(nn * r * c AS BIGINT) AS den FROM chl),\n"
        "chq AS MATERIALIZED (SELECT event_type, dow, asq, den,\n"
        "  CAST((asq - asq % den) // den AS BIGINT) AS q,\n"
        "  CAST(asq % den AS BIGINT) AS rem FROM chm),\n"
        "chx AS MATERIALIZED (SELECT event_type, dow,\n"
        "  CAST(1000000 * q + (1000000 * rem - (1000000 * rem) % den)"
        " // den AS BIGINT) AS t_micros FROM chq)\n"
        "SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,\n"
        "  CAST(count(DISTINCT dow) AS BIGINT) AS n_dows,\n"
        "  CAST((count(DISTINCT event_type) - 1)\n"
        "    * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,\n"
        "  CAST(sum(t_micros) AS BIGINT) AS chi2_micros\n"
        "FROM chx"
    )


def twonn_intrinsic_dim_sql() -> str:
    """Mirror of operators.similarity.twonn_intrinsic_dim: rounded
    squared distances, top-2 by (dsq, id), micro-exact ln-ratio sum."""
    dsq = (
        "round(list_inner_product(q.v, q.v) + list_inner_product(c.v, c.v)"
        " - 2.0 * list_inner_product(q.v, c.v), 6)"
    )
    return (
        f"WITH {_EMB_D},\n"
        "tns AS MATERIALIZED (\n"
        f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
        f" {dsq} AS dsq\n"
        "  FROM e q JOIN e c ON c.vec_id <> q.vec_id),\n"
        "tnt AS MATERIALIZED (\n"
        "  SELECT query_id, dsq, rk FROM (\n"
        "    SELECT *, row_number() OVER (PARTITION BY query_id\n"
        "      ORDER BY dsq ASC, neighbor_id ASC) AS rk FROM tns)\n"
        "  WHERE rk <= 2),\n"
        "tnp AS MATERIALIZED (SELECT query_id,\n"
        "  min(CASE WHEN rk = 1 THEN dsq END) AS d1,\n"
        "  min(CASE WHEN rk = 2 THEN dsq END) AS d2\n"
        "  FROM tnt GROUP BY 1),\n"
        "tnm AS MATERIALIZED (SELECT\n"
        "  CAST(round(ln(d2 / d1) * 500000.0) AS BIGINT)"
        " AS lnmu_micros\n"
        "  FROM tnp WHERE d1 > 0 AND d2 IS NOT NULL),\n"
        "tna AS (SELECT CAST(count(*) AS BIGINT) AS n_used,\n"
        "  CAST(COALESCE(sum(lnmu_micros), 0) AS BIGINT)"
        " AS sum_lnmu_micros FROM tnm)\n"
        "SELECT n_used, sum_lnmu_micros,\n"
        "  CASE WHEN sum_lnmu_micros > 0\n"
        "  THEN round(CAST(n_used AS DOUBLE) * 1000000.0\n"
        "    / CAST(sum_lnmu_micros AS DOUBLE), 6) END AS id_mle\n"
        "FROM tna"
    )


def uniformity_metric_sql(t: float = 2.0) -> str:
    """Mirror of operators.similarity.uniformity_metric: per-pair
    Gaussian potential in exact nanos, one final log-mean float."""
    cos = (
        "(list_inner_product(q.v, c.v) /"
        " (sqrt(list_inner_product(q.v, q.v))"
        " * sqrt(list_inner_product(c.v, c.v))))"
    )
    g = f"exp(-{t!r} * (2.0 - 2.0 * {cos}))"
    return (
        f"WITH {_EMB_D},\n"
        "unp AS MATERIALIZED (\n"
        f"  SELECT CAST(round({g} * 1000000000.0) AS BIGINT)"
        " AS g_nanos\n"
        "  FROM e q JOIN e c ON q.vec_id < c.vec_id),\n"
        "una AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,\n"
        "  CAST(COALESCE(sum(g_nanos), 0) AS BIGINT) AS sum_g_nanos\n"
        "  FROM unp)\n"
        "SELECT n_pairs, sum_g_nanos,\n"
        "  CASE WHEN n_pairs > 0 AND sum_g_nanos > 0\n"
        "  THEN round(ln(CAST(sum_g_nanos AS DOUBLE)\n"
        "    / (CAST(n_pairs AS DOUBLE) * 1000000000.0)), 6) END"
        " AS uniformity\n"
        "FROM una"
    )


def burt_constraint_sql() -> str:
    """Mirror of algos.stats.burt_constraint over the contact graph:
    distinct undirected pairs, micro-floored p-products, pico-exact
    per-vertex sums.  The oracle brute-forces the common-neighbor
    wedge join — orientation is a Spark-side performance device."""
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst),\n"
        "bup AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS lo,\n"
        "  greatest(src, dst) AS hi FROM ce),\n"
        "badj AS MATERIALIZED (SELECT lo AS i, hi AS j FROM bup\n"
        "  UNION ALL SELECT hi, lo FROM bup),\n"
        "bdeg AS MATERIALIZED (SELECT i AS v,"
        " CAST(count(*) AS BIGINT) AS d FROM badj GROUP BY 1),\n"
        "bind AS MATERIALIZED (\n"
        "  SELECT a.i, a.j,\n"
        "    CAST(sum(1000000 // (di.d * dq.d)) AS BIGINT) AS w\n"
        "  FROM badj a\n"
        "  JOIN badj n1 ON n1.i = a.i\n"
        "  JOIN badj n2 ON n2.i = a.j AND n2.j = n1.j\n"
        "  JOIN bdeg di ON di.v = a.i\n"
        "  JOIN bdeg dq ON dq.v = n1.j\n"
        "  WHERE n1.j <> a.j\n"
        "  GROUP BY 1, 2),\n"
        "bs AS MATERIALIZED (SELECT a.i,\n"
        "  CAST(1000000 // d.d + COALESCE(x.w, 0) AS BIGINT) AS s\n"
        "  FROM badj a JOIN bdeg d ON d.v = a.i\n"
        "  LEFT JOIN bind x ON x.i = a.i AND x.j = a.j)\n"
        "SELECT bs.i AS user_id,\n"
        "  CAST(dd.d AS BIGINT) AS degree,\n"
        "  CAST(sum(bs.s * bs.s) AS BIGINT) AS constraint_pico\n"
        "FROM bs JOIN bdeg dd ON dd.v = bs.i GROUP BY 1, 2"
    )


def nelson_aalen_sql() -> str:
    """Mirror of operators.analytics.nelson_aalen: the kaplan_meier
    lifetime/censoring CTEs with an additive cumulative micro-hazard
    instead of the product-limit fold."""
    return (
        "WITH na_per AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    min(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS first_d,\n"
        "    max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS last_d\n"
        "  FROM events GROUP BY 1),\n"
        "na_hi AS (SELECT max(last_d) AS hi FROM na_per),\n"
        "na_durs AS MATERIALIZED (\n"
        "  SELECT last_d - first_d AS t,\n"
        "    CAST(count(*) AS BIGINT) AS c,\n"
        "    CAST(sum(CASE WHEN last_d = (SELECT hi FROM na_hi)"
        " THEN 0 ELSE 1 END) AS BIGINT) AS d\n"
        "  FROM na_per GROUP BY 1),\n"
        "na_risk AS MATERIALIZED (\n"
        "  SELECT t, d, n,\n"
        "    CAST((1000000 * d) // n AS BIGINT) AS h FROM (\n"
        "    SELECT t, d, CAST(sum(c) OVER (ORDER BY t DESC\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS n\n"
        "    FROM na_durs) WHERE d > 0)\n"
        "SELECT t AS duration_days, n AS n_risk, d AS n_deaths,\n"
        "  CAST(sum(h) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS cumhaz_micros\n"
        "FROM na_risk"
    )


def gopher_rule_flags_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    group_col: str = "source",
) -> str:
    """Mirror of operators.profiling.gopher_rule_flags: identical
    whitespace tokens, cross-multiplied integer rules."""
    stop8 = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"
    return (
        f"WITH {TOKS_CTE},\n"
        "gfd AS MATERIALIZED (\n"
        f"  SELECT d.{group_col},\n"
        "    CAST(len(t.toks) AS BIGINT) AS n,\n"
        "    CAST(COALESCE(list_sum(list_transform(t.toks,"
        " x -> length(x))), 0) AS BIGINT) AS sum_len,\n"
        "    CAST(len(list_filter(t.toks,"
        " x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,\n"
        f"    CAST(len(list_filter(t.toks,"
        f" x -> list_contains({stop8}, x))) AS BIGINT) AS n_stop8\n"
        "  FROM documents d JOIN toks_t t ON t.doc_id = d.doc_id),\n"
        "gff AS MATERIALIZED (SELECT\n"
        f"  {group_col},\n"
        f"  CASE WHEN n < {int(min_words)} OR n > {int(max_words)}"
        " THEN 1 ELSE 0 END AS fw,\n"
        "  CASE WHEN sum_len < 3 * n OR sum_len > 10 * n"
        " THEN 1 ELSE 0 END AS fl,\n"
        "  CASE WHEN 5 * n_alpha < 4 * n THEN 1 ELSE 0 END AS fa,\n"
        "  CASE WHEN n_stop8 < 2 THEN 1 ELSE 0 END AS fs\n"
        "  FROM gfd)\n"
        f"SELECT {group_col},\n"
        "  CAST(count(*) AS BIGINT) AS n_docs,\n"
        "  CAST(sum(fw) AS BIGINT) AS fail_words,\n"
        "  CAST(sum(fl) AS BIGINT) AS fail_wordlen,\n"
        "  CAST(sum(fa) AS BIGINT) AS fail_alpha,\n"
        "  CAST(sum(fs) AS BIGINT) AS fail_stop,\n"
        "  CAST(sum(CASE WHEN fw + fl + fa + fs = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_pass\n"
        f"FROM gff GROUP BY 1"
    )


def good_turing_counts_sql(max_r: int = 50) -> str:
    """Mirror of operators.profiling.good_turing_counts: vocabulary
    counts, frequency-of-frequencies, exact floor-micro r*."""
    return (
        f"WITH {TOKS_CTE},\n"
        "gtc AS MATERIALIZED (SELECT tok,"
        " CAST(count(*) AS BIGINT) AS r FROM (\n"
        "  SELECT unnest(toks) AS tok FROM toks_t) GROUP BY 1),\n"
        "gtn AS MATERIALIZED (SELECT r,"
        " CAST(count(*) AS BIGINT) AS n_r FROM gtc GROUP BY 1)\n"
        "SELECT a.r, a.n_r,\n"
        "  CAST((1000000 * (a.r + 1) * b.n_r\n"
        "    - (1000000 * (a.r + 1) * b.n_r) % a.n_r) // a.n_r"
        " AS BIGINT) AS r_star_micros\n"
        "FROM gtn a LEFT JOIN gtn b ON b.r = a.r + 1\n"
        f"WHERE a.r <= {int(max_r)}"
    )


def holt_linear_daily_sql(
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
) -> str:
    """Mirror of operators.analytics.holt_linear_daily: zero-filled
    day spine, recursive CTE carrying the coupled (level, trend)
    state, identical remainder-subtract truncation (both engines'
    % follows the dividend, so the division truncates toward zero
    on both)."""
    an, ad = int(alpha_num), int(alpha_den)
    bn, bd = int(beta_num), int(beta_den)
    rawl = f"({an} * 1000000 * k.y + {ad - an} * (f.l + f.b))"
    lnew = f"CAST(({rawl} - {rawl} % {ad}) / {ad} AS BIGINT)"
    rawb = f"({bn} * ({lnew} - f.l) + {bd - bn} * f.b)"
    return (
        "WITH RECURSIVE hl_daily AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),\n"
        "hl_rng AS (SELECT min(d) AS lo, max(d) AS hi FROM hl_daily),\n"
        "hl_spine AS MATERIALIZED (SELECT unnest(range(\n"
        "  (SELECT lo FROM hl_rng), (SELECT hi FROM hl_rng) + 1))"
        " AS d),\n"
        "hl_filled AS MATERIALIZED (\n"
        "  SELECT s.d, CAST(COALESCE(dd.y, 0) AS BIGINT) AS y,\n"
        "    row_number() OVER (ORDER BY s.d) AS i\n"
        "  FROM hl_spine s LEFT JOIN hl_daily dd ON dd.d = s.d),\n"
        "hl_fold(i, d, y, l, b) AS (\n"
        "  SELECT f2.i, f2.d, f2.y,\n"
        "    CAST(1000000 * f2.y AS BIGINT),\n"
        "    CAST(1000000 * (f2.y - f1.y) AS BIGINT)\n"
        "  FROM hl_filled f2 JOIN hl_filled f1 ON f1.i = 1\n"
        "  WHERE f2.i = 2\n"
        "  UNION ALL\n"
        "  SELECT k.i, k.d, k.y,\n"
        f"    {lnew},\n"
        f"    CAST(({rawb} - {rawb} % {bd}) / {bd} AS BIGINT)\n"
        "  FROM hl_fold f JOIN hl_filled k ON k.i = f.i + 1)\n"
        "SELECT f1.d, f1.y,\n"
        "  CAST(NULL AS BIGINT) AS level_micros,\n"
        "  CAST(NULL AS BIGINT) AS trend_micros,\n"
        "  CAST(NULL AS BIGINT) AS resid_micros\n"
        "FROM hl_filled f1 WHERE f1.i = 1\n"
        "UNION ALL\n"
        "SELECT c.d, c.y, c.l, c.b,\n"
        "  CAST(1000000 * c.y - (p.l + p.b) AS BIGINT)\n"
        "FROM hl_fold c LEFT JOIN hl_fold p ON p.i = c.i - 1"
    )


def sprt_daily_sql(
    convert_type: str = "purchase",
    p0: float = 0.05,
    p1: float = 0.08,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> str:
    """Mirror of operators.analytics.sprt_daily: the four log
    constants are micro-rounded in the SAME CPython that parameterizes
    the Spark side, so both engines consume identical integer
    literals."""
    import math

    llr1 = round(1_000_000 * math.log(p1 / p0))
    llr0 = round(1_000_000 * math.log((1 - p1) / (1 - p0)))
    upper = round(1_000_000 * math.log((1 - beta) / alpha))
    lower = round(1_000_000 * math.log(beta / (1 - alpha)))
    cv = convert_type.replace("'", "''")
    return (
        "WITH sp_daily AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS n,\n"
        f"    CAST(sum(CASE WHEN event_type = '{cv}' THEN 1 ELSE 0"
        " END) AS BIGINT) AS c\n"
        "  FROM events GROUP BY 1),\n"
        "sp_cum AS MATERIALIZED (SELECT d, n, c,\n"
        f"  CAST(sum(c * ({llr1}) + (n - c) * ({llr0})) OVER (\n"
        "    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT"
        " ROW) AS BIGINT) AS cum_llr_micros\n"
        "  FROM sp_daily)\n"
        "SELECT d, n, c, cum_llr_micros,\n"
        f"  CASE WHEN cum_llr_micros >= {upper} THEN 'accept_h1'\n"
        f"    WHEN cum_llr_micros <= {lower} THEN 'accept_h0'\n"
        "    ELSE 'continue' END AS decision\n"
        "FROM sp_cum"
    )


def winsorized_stats_sql(lo_pct: int = 5, hi_pct: int = 95) -> str:
    """Mirror of operators.analytics.winsorized_stats: identical rank
    rule, clamped-cents exact micro mean."""
    lo, hi = int(lo_pct), int(hi_pct)
    return (
        "WITH wsc AS MATERIALIZED (SELECT event_type,\n"
        "  CAST(round(value * 100) AS BIGINT) AS cents FROM events),\n"
        "wsr AS MATERIALIZED (SELECT event_type, cents,\n"
        "  row_number() OVER (PARTITION BY event_type ORDER BY cents)"
        " AS rn,\n"
        "  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)"
        " AS n\n"
        "  FROM wsc),\n"
        "wst AS MATERIALIZED (SELECT event_type,\n"
        "  CAST(max(n) AS BIGINT) AS n,\n"
        f"  min(CASE WHEN rn = greatest(({lo} * n + 99) // 100, 1)"
        " THEN cents END) AS lo_cents,\n"
        f"  min(CASE WHEN rn = ({hi} * n + 99) // 100"
        " THEN cents END) AS hi_cents\n"
        "  FROM wsr GROUP BY 1),\n"
        "wsm AS MATERIALIZED (SELECT c.event_type, t.n, t.lo_cents,"
        " t.hi_cents,\n"
        "  greatest(t.lo_cents, least(t.hi_cents, c.cents)) AS wc\n"
        "  FROM wsc c JOIN wst t ON t.event_type = c.event_type)\n"
        "SELECT event_type, n, lo_cents, hi_cents,\n"
        "  CAST((10000 * sum(wc) - (10000 * sum(wc)) % max(n))"
        " // max(n) AS BIGINT) AS wmean_micros\n"
        "FROM wsm GROUP BY 1, 2, 3, 4"
    )


def tie_strength_embeddedness_sql() -> str:
    """Mirror of algos.stats.tie_strength_embeddedness over the contact
    graph: strength keeps arc multiplicity, support brute-forces the
    common-neighbor count per distinct pair (orientation is Spark-side
    performance), assortativity-style shared float."""
    num = "(m * ssx - ss * sx)"
    vars_ = "(m * sss - ss * ss)"
    varx = "(m * sxx - sx * sx)"
    return (
        "WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "ce AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src,\n"
        "         user_id AS dst FROM ev)\n"
        "  WHERE src IS NOT NULL AND src <> dst),\n"
        "tse_s AS MATERIALIZED (SELECT least(src, dst) AS lo,\n"
        "  greatest(src, dst) AS hi, CAST(count(*) AS BIGINT) AS s\n"
        "  FROM ce GROUP BY 1, 2),\n"
        "tse_p AS MATERIALIZED (SELECT lo, hi FROM tse_s),\n"
        "tse_adj AS MATERIALIZED (SELECT lo AS a, hi AS b FROM tse_p\n"
        "  UNION ALL SELECT hi, lo FROM tse_p),\n"
        "tse_sup AS MATERIALIZED (SELECT p.lo, p.hi,\n"
        "  CAST(count(*) AS BIGINT) AS x\n"
        "  FROM tse_p p\n"
        "  JOIN tse_adj n1 ON n1.a = p.lo\n"
        "  JOIN tse_adj n2 ON n2.a = p.hi AND n2.b = n1.b\n"
        "  GROUP BY 1, 2),\n"
        "tse_b AS MATERIALIZED (SELECT s.s,\n"
        "  CAST(COALESCE(u.x, 0) AS BIGINT) AS x\n"
        "  FROM tse_s s LEFT JOIN tse_sup u\n"
        "  ON u.lo = s.lo AND u.hi = s.hi),\n"
        "tse_a AS (SELECT CAST(count(*) AS BIGINT) AS m,\n"
        "  CAST(sum(s) AS BIGINT) AS ss,\n"
        "  CAST(sum(x) AS BIGINT) AS sx,\n"
        "  CAST(sum(s * s) AS BIGINT) AS sss,\n"
        "  CAST(sum(x * x) AS BIGINT) AS sxx,\n"
        "  CAST(sum(s * x) AS BIGINT) AS ssx FROM tse_b)\n"
        "SELECT m AS n_edges, ss AS sum_strength, sx AS sum_support,\n"
        f"  CASE WHEN {vars_} > 0 AND {varx} > 0\n"
        f"  THEN round(CAST({num} AS DOUBLE)\n"
        f"    / sqrt(CAST({vars_} AS DOUBLE) * CAST({varx} AS DOUBLE)),"
        " 6) END AS corr\n"
        "FROM tse_a"
    )


def char_entropy_sql() -> str:
    """Mirror of operators.profiling.char_entropy: per-character
    micro-rounded n·ln n terms (order-independent BIGINT sum), one
    shared final float."""
    chs = "list_transform(range(1, length(text) + 1), i -> text[i])"
    cnt = "len(list_filter(chs, x -> x = u))"
    return (
        "WITH ced AS MATERIALIZED (SELECT doc_id,\n"
        f"  {chs} AS chs,\n"
        "  CAST(length(text) AS BIGINT) AS n FROM documents),\n"
        "ces AS MATERIALIZED (SELECT doc_id, n,\n"
        "  CAST(COALESCE(list_sum(list_transform(list_distinct(chs),\n"
        f"    u -> CAST(round(1000000.0 * {cnt} * ln({cnt}))"
        " AS BIGINT))), 0) AS BIGINT) AS s\n"
        "  FROM ced)\n"
        "SELECT doc_id, n AS n_chars_counted,\n"
        "  CASE WHEN n > 0 THEN CAST(round(1000000.0"
        " * ln(CAST(n AS DOUBLE))\n"
        "    - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) END"
        " AS entropy_micros\n"
        "FROM ces"
    )


def quantile_treatment_effect_sql(
    cohort_type: str = "signup", percents: tuple = (25, 50, 75)
) -> str:
    """Mirror of operators.analytics.quantile_treatment_effect: per-unit
    cents totals, cohort flag, per-cohort rank-rule quantiles."""
    cv = cohort_type.replace("'", "''")
    branches = []
    for p in percents:
        p = int(p)
        branches.append(
            "SELECT "
            f"CAST({p} AS BIGINT) AS pct,\n"
            "  CAST(max(CASE WHEN a = 1 THEN n END) AS BIGINT) AS n_a,\n"
            "  CAST(max(CASE WHEN a = 0 THEN n END) AS BIGINT) AS n_b,\n"
            f"  min(CASE WHEN a = 1 AND rn = greatest(({p} * n + 99)"
            " // 100, 1) THEN tot END) AS q_a_cents,\n"
            f"  min(CASE WHEN a = 0 AND rn = greatest(({p} * n + 99)"
            " // 100, 1) THEN tot END) AS q_b_cents\n"
            "FROM qtr"
        )
    union = "\nUNION ALL\n".join(branches)
    return (
        "WITH qtf AS MATERIALIZED (SELECT u, a FROM (\n"
        "  SELECT user_id AS u,\n"
        f"    CASE WHEN event_type = '{cv}' THEN 1 ELSE 0 END AS a,\n"
        "    row_number() OVER (PARTITION BY user_id\n"
        "      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS rn\n"
        "  FROM events) WHERE rn = 1),\n"
        "qtt AS MATERIALIZED (SELECT user_id AS u,\n"
        "  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS tot\n"
        "  FROM events GROUP BY 1),\n"
        "qtp AS MATERIALIZED (SELECT t.u, f.a, t.tot\n"
        "  FROM qtt t JOIN qtf f ON f.u = t.u),\n"
        "qtr AS MATERIALIZED (SELECT a, tot,\n"
        "  row_number() OVER (PARTITION BY a ORDER BY tot) AS rn,\n"
        "  CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS n\n"
        "  FROM qtp),\n"
        f"qtq AS ({union})\n"
        "SELECT pct, n_a, n_b,\n"
        "  CAST(q_a_cents AS BIGINT) AS q_a_cents,\n"
        "  CAST(q_b_cents AS BIGINT) AS q_b_cents,\n"
        "  CAST(q_a_cents - q_b_cents AS BIGINT) AS diff_cents\n"
        "FROM qtq"
    )


def simpson_diversity_sql(group_col: str = "source") -> str:
    """Mirror of operators.profiling.simpson_diversity: per-source
    token counts, exact micro-floored lambda and 1/lambda."""
    return (
        f"WITH {TOKS_CTE},\n"
        "sdc AS MATERIALIZED (SELECT g, tok,"
        " CAST(count(*) AS BIGINT) AS c FROM (\n"
        f"  SELECT d.{group_col} AS g, unnest(t.toks) AS tok\n"
        "  FROM documents d JOIN toks_t t ON t.doc_id = d.doc_id)\n"
        "  GROUP BY 1, 2),\n"
        "sda AS MATERIALIZED (SELECT g,\n"
        "  CAST(sum(c) AS BIGINT) AS n_tokens,\n"
        "  CAST(count(*) AS BIGINT) AS n_distinct,\n"
        "  CAST(sum(c * (c - 1)) AS BIGINT) AS num FROM sdc"
        " GROUP BY 1)\n"
        f"SELECT g AS {group_col}, n_tokens, n_distinct,\n"
        "  CASE WHEN n_tokens >= 2 THEN\n"
        "    CAST((1000000 * num - (1000000 * num)"
        " % (n_tokens * (n_tokens - 1)))\n"
        "      // (n_tokens * (n_tokens - 1)) AS BIGINT) END"
        " AS simpson_micros,\n"
        "  CASE WHEN n_tokens >= 2 AND num > 0 THEN\n"
        "    CAST((1000000 * n_tokens * (n_tokens - 1)\n"
        "      - (1000000 * n_tokens * (n_tokens - 1)) % num)"
        " // num AS BIGINT) END AS inv_simpson_micros\n"
        "FROM sda"
    )


def kmeans_silhouette_sql(
    k: int = 4, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.kmeans_silhouette: the shared
    unrolled-Lloyd CTEs, then per-vector first/second centroid
    distances via the (d2, cl) row rule, micro-rounded s, exact
    per-cluster mean."""
    parts = _kmeans_ctes(k, iterations, d)
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "sil_d AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    CAST(sum((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN cent{iterations} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl),\n"
        "sil_p AS MATERIALIZED (\n"
        "  SELECT a.vec_id, CAST(a.cl AS BIGINT) AS cluster,\n"
        "    CASE WHEN b.d2 IS NOT NULL AND b.d2 > 0 THEN\n"
        "      CAST(round(1000000.0 * (1.0\n"
        "        - sqrt(CAST(a.d2 AS DOUBLE))"
        " / sqrt(CAST(b.d2 AS DOUBLE)))) AS BIGINT)\n"
        "    ELSE 0 END AS s\n"
        "  FROM (SELECT * FROM sil_d WHERE rn = 1) a\n"
        "  LEFT JOIN (SELECT * FROM sil_d WHERE rn = 2) b\n"
        "    ON b.vec_id = a.vec_id)\n"
        "SELECT cluster, CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST((sum(s) - sum(s) % count(*)) // count(*) AS BIGINT)\n"
        "    AS mean_sil_micros\n"
        "FROM sil_p GROUP BY 1"
    )


def transition_latency_sql(percents: tuple = (50, 90)) -> str:
    """Mirror of operators.temporal.transition_latency: per-unit lag
    pairs, BIGINT second gaps, the grouped_quantiles rank rule."""
    picks = ",\n".join(
        f"  round(max(CASE WHEN rn = (n.n * {int(p)} + 99) // 100"
        f" THEN gap_s END), 6) AS p{int(p)}"
        for p in percents
    )
    return (
        "WITH tl_src AS MATERIALIZED (\n"
        "  SELECT transition, gap_s FROM (\n"
        "    SELECT lag(event_type) OVER wo || '>' || event_type"
        " AS transition,\n"
        "      (CAST(epoch_us(ts) AS BIGINT)\n"
        "        - lag(CAST(epoch_us(ts) AS BIGINT)) OVER wo)"
        " // 1000000 AS gap_s\n"
        "    FROM events WINDOW wo AS (PARTITION BY user_id\n"
        "      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id))\n"
        "  WHERE gap_s IS NOT NULL),\n"
        "tl_r AS MATERIALIZED (SELECT transition, gap_s,\n"
        "  row_number() OVER (PARTITION BY transition ORDER BY gap_s)"
        " AS rn FROM tl_src),\n"
        "tl_n AS (SELECT transition, count(*) AS n FROM tl_src"
        " GROUP BY 1)\n"
        "SELECT r.transition, CAST(max(n.n) AS BIGINT) AS n,\n"
        f"{picks}\n"
        "FROM tl_r r JOIN tl_n n USING (transition)\n"
        "GROUP BY r.transition"
    )


def resource_allocation_sql(
    max_wedge_degree: int | None = 100, min_score_micros: int = 100_000
) -> str:
    """Mirror of algos.linkpred.resource_allocation: the adamic_adar
    wedge join with 1/deg (not 1/ln deg) micro-unit center weights."""
    cap = (
        f"AND deg <= {max_wedge_degree}" if max_wedge_degree is not None else ""
    )
    body = (
        ", wdeg AS MATERIALIZED (SELECT src AS w, count(*) AS deg"
        " FROM und GROUP BY src),\n"
        "ctr AS MATERIALIZED (\n"
        "  SELECT w, CAST(round(1000000.0 / deg) AS BIGINT) AS wt\n"
        f"  FROM wdeg WHERE deg >= 2 {cap}),\n"
        "wedge AS MATERIALIZED (\n"
        "  SELECT e1.dst AS u, e2.dst AS v, c.wt\n"
        "  FROM und e1 JOIN und e2 ON e2.src = e1.src AND e1.dst < e2.dst\n"
        "  JOIN ctr c ON c.w = e1.src),\n"
        "pairs AS MATERIALIZED (\n"
        "  SELECT u, v, CAST(sum(wt) AS BIGINT) AS ra_micros\n"
        "  FROM wedge GROUP BY u, v)\n"
        "SELECT p.u, p.v, p.ra_micros FROM pairs p\n"
        "LEFT JOIN (SELECT src AS u, dst AS v FROM und WHERE src < dst) ex\n"
        "  ON ex.u = p.u AND ex.v = p.v\n"
        f"WHERE ex.u IS NULL AND p.ra_micros >= {min_score_micros}"
    )
    return _graph_query(body)


def preferential_attachment_sql(
    max_wedge_degree: int | None = 100, min_score: int = 1
) -> str:
    """Mirror of algos.linkpred.preferential_attachment: full-graph
    degree product over the non-adjacent wedge-candidate pairs — all
    exact BIGINT, no rounding anywhere."""
    cap = (
        f"AND deg <= {max_wedge_degree}" if max_wedge_degree is not None else ""
    )
    body = (
        ", wdeg AS MATERIALIZED (SELECT src, count(*) AS deg"
        " FROM und GROUP BY src),\n"
        "ctr AS MATERIALIZED (\n"
        f"  SELECT src AS w FROM wdeg WHERE deg >= 2 {cap}),\n"
        "pairs AS MATERIALIZED (\n"
        "  SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn\n"
        "  FROM und e1 JOIN und e2 ON e2.src = e1.src AND e1.dst < e2.dst\n"
        "  JOIN ctr c ON c.w = e1.src\n"
        "  GROUP BY e1.dst, e2.dst)\n"
        "SELECT p.u, p.v, p.cn,\n"
        "  CAST(a.deg * b.deg AS BIGINT) AS pa_score\n"
        "FROM pairs p\n"
        "JOIN wdeg a ON a.src = p.u\n"
        "JOIN wdeg b ON b.src = p.v\n"
        "LEFT JOIN (SELECT src AS u, dst AS v FROM und WHERE src < dst) ex\n"
        "  ON ex.u = p.u AND ex.v = p.v\n"
        f"WHERE ex.u IS NULL AND a.deg * b.deg >= {min_score}"
    )
    return _graph_query(body)


def theil_sen_trend_sql() -> str:
    """Mirror of operators.analytics.theil_sen_trend: zero-filled daily
    counts, per-pair (10^6 Δy)//Δx slopes (BIGINT truncation toward
    zero, measured identical to Spark div), upper-median rank picks for
    slope and intercept."""
    return (
        "WITH tsd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "tsr AS (SELECT min(d) AS lo, max(d) AS hi FROM tsd),\n"
        "tsp AS MATERIALIZED (\n"
        "  SELECT CAST(s.d - s.lo AS BIGINT) AS x,\n"
        "    CAST(COALESCE(t.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d, lo FROM tsr) s\n"
        "  LEFT JOIN tsd t USING (d)),\n"
        "tsl AS MATERIALIZED (\n"
        "  SELECT (1000000 * (b.y - a.y)) // (b.x - a.x) AS s\n"
        "  FROM tsp a JOIN tsp b ON b.x > a.x),\n"
        "tslr AS MATERIALIZED (\n"
        "  SELECT s, row_number() OVER (ORDER BY s) AS rn,\n"
        "    count(*) OVER () AS np FROM tsl),\n"
        "tspk AS (SELECT s AS slope_micros, np FROM tslr\n"
        "  WHERE rn = (np + 2) // 2),\n"
        "tsres AS MATERIALIZED (\n"
        "  SELECT 1000000 * p.y - k.slope_micros * p.x AS r,\n"
        "    k.slope_micros, k.np\n"
        "  FROM tsp p, tspk k),\n"
        "tsrr AS (SELECT r, slope_micros, np,\n"
        "  row_number() OVER (ORDER BY r) AS rn,\n"
        "  count(*) OVER () AS nd FROM tsres)\n"
        "SELECT CAST(nd AS BIGINT) AS n_days,\n"
        "  CAST(np AS BIGINT) AS n_pairs,\n"
        "  CAST(slope_micros AS BIGINT) AS slope_micros,\n"
        "  CAST(r AS BIGINT) AS intercept_micros\n"
        "FROM tsrr WHERE rn = (nd + 2) // 2"
    )


def max_drawdown_sql() -> str:
    """Mirror of operators.analytics.max_drawdown: zero-filled daily
    cents, cumulative sum, running max, argmax-by-(dd DESC, day ASC)
    pick — all integer window functions."""
    return (
        "WITH mdd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS cents\n"
        "  FROM events GROUP BY 1),\n"
        "mdr AS (SELECT min(d) AS lo, max(d) AS hi FROM mdd),\n"
        "mdf AS MATERIALIZED (\n"
        "  SELECT CAST(s.d - s.lo AS BIGINT) AS x,\n"
        "    CAST(COALESCE(e.cents, 0) AS BIGINT) AS c\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d, lo FROM mdr) s\n"
        "  LEFT JOIN mdd e USING (d)),\n"
        "mdc AS MATERIALIZED (\n"
        "  SELECT x, sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum FROM mdf),\n"
        "mdw AS MATERIALIZED (\n"
        "  SELECT x,\n"
        "    max(cum) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS peak,\n"
        "    max(cum) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) - cum AS dd\n"
        "  FROM mdc),\n"
        "mdp AS (SELECT x, peak, dd,\n"
        "  row_number() OVER (ORDER BY dd DESC, x ASC) AS rn,\n"
        "  count(*) OVER () AS nd FROM mdw)\n"
        "SELECT CAST(nd AS BIGINT) AS n_days,\n"
        "  CAST(peak AS BIGINT) AS peak_cents,\n"
        "  CAST(dd AS BIGINT) AS max_drawdown_cents,\n"
        "  CAST(x AS BIGINT) AS dd_day\n"
        "FROM mdp WHERE rn = 1"
    )


def scd2_history_sql(field: str = "k", bucket: int = 25) -> str:
    """Mirror of operators.relational.scd2_history: change-log collapse
    + versioned half-open validity windows, BIGINT micros throughout."""
    b = int(bucket)
    return (
        "WITH s2u AS MATERIALIZED (\n"
        "  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,"
        " event_id,\n"
        f"    CAST(json_extract(props, '$.{field}') AS BIGINT) // {b}"
        " AS tier\n"
        "  FROM events),\n"
        "s2c AS MATERIALIZED (\n"
        "  SELECT user_id, ts_us, event_id, tier FROM (\n"
        "    SELECT *, lag(tier) OVER (PARTITION BY user_id\n"
        "      ORDER BY ts_us, event_id) AS pt FROM s2u)\n"
        "  WHERE pt IS NULL OR tier <> pt)\n"
        "SELECT user_id, tier,\n"
        "  ts_us AS valid_from_us,\n"
        "  lead(ts_us) OVER w2 AS valid_to_us,\n"
        "  CAST(row_number() OVER w2 AS BIGINT) AS version,\n"
        "  lead(ts_us) OVER w2 IS NULL AS is_current\n"
        "FROM s2c WINDOW w2 AS (PARTITION BY user_id"
        " ORDER BY ts_us, event_id)"
    )


def welch_ttest_sql(type_a: str = "purchase", type_b: str = "click") -> str:
    """Mirror of operators.analytics.welch_ttest: six exact BIGINT
    moments, then the closed-form t and Welch-Satterthwaite df as
    rounded doubles (squares taken after the int->double cast)."""
    va = ("(q_a - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)"
          " / (n_a - 1)")
    vb = ("(q_b - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)"
          " / (n_b - 1)")
    se2 = f"({va} / n_a + {vb} / n_b)"
    return (
        "WITH wtm AS MATERIALIZED (\n"
        "  SELECT\n"
        f"    CAST(sum(CASE WHEN event_type = '{type_a}' THEN 1"
        " ELSE 0 END) AS BIGINT) AS n_a,\n"
        f"    CAST(sum(CASE WHEN event_type = '{type_a}' THEN c"
        " ELSE 0 END) AS BIGINT) AS s_a,\n"
        f"    CAST(sum(CASE WHEN event_type = '{type_a}' THEN c * c"
        " ELSE 0 END) AS BIGINT) AS q_a,\n"
        f"    CAST(sum(CASE WHEN event_type = '{type_b}' THEN 1"
        " ELSE 0 END) AS BIGINT) AS n_b,\n"
        f"    CAST(sum(CASE WHEN event_type = '{type_b}' THEN c"
        " ELSE 0 END) AS BIGINT) AS s_b,\n"
        f"    CAST(sum(CASE WHEN event_type = '{type_b}' THEN c * c"
        " ELSE 0 END) AS BIGINT) AS q_b\n"
        "  FROM (SELECT event_type,"
        " CAST(round(value * 100) AS BIGINT) AS c FROM events\n"
        f"    WHERE event_type IN ('{type_a}', '{type_b}')) t)\n"
        "SELECT n_a, n_b,\n"
        "  round(CAST(s_a AS DOUBLE) / n_a, 6) AS mean_a_cents,\n"
        "  round(CAST(s_b AS DOUBLE) / n_b, 6) AS mean_b_cents,\n"
        f"  CASE WHEN n_a >= 2 AND n_b >= 2 AND {se2} > 0 THEN\n"
        "    round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE)"
        " / n_b)\n"
        f"      / sqrt({se2}), 6) END AS t_stat,\n"
        f"  CASE WHEN n_a >= 2 AND n_b >= 2 AND {se2} > 0 THEN\n"
        f"    round(pow({se2}, 2) / (pow({va} / n_a, 2) / (n_a - 1)\n"
        f"      + pow({vb} / n_b, 2) / (n_b - 1)), 6) END AS df\n"
        "FROM wtm"
    )


def pca_top_component_sql(iterations: int = 8) -> str:
    """Mirror of operators.similarity.pca_top_component: the shared
    centered-micro covariance CTEs (full symmetric matrix via the
    mirrored triangle), then ``iterations`` unrolled rounds of integer
    power iteration — matrix and vector renormalized to ±10⁶ by
    truncating division, HUGEINT everywhere a product can pass 9.2e18 —
    and the Rayleigh-over-trace explained-variance ratio."""
    its = int(iterations)
    parts = [
        _CENTROID_CTES,
        "pc_x AS MATERIALIZED (\n"
        "  SELECT list_transform(range(1, len(v) + 1),"
        " t -> v[t] - cv[t]) AS xv\n"
        "  FROM co_q, co_cl)",
        "pc_p AS MATERIALIZED (\n"
        "  SELECT CAST(ti.i - 1 AS BIGINT) AS i,"
        " CAST(tj.j - 1 AS BIGINT) AS j,\n"
        "    CAST(SUM(xv[ti.i] * xv[tj.j]) AS BIGINT) AS cov\n"
        "  FROM pc_x,\n"
        "    UNNEST(range(1, len(xv) + 1)) AS ti(i),\n"
        "    UNNEST(range(1, len(xv) + 1)) AS tj(j)\n"
        "  WHERE tj.j >= ti.i GROUP BY ti.i, tj.j)",
        "pc_f AS MATERIALIZED (\n"
        "  SELECT i, j, cov FROM pc_p\n"
        "  UNION ALL SELECT j, i, cov FROM pc_p WHERE j > i)",
        "pc_m AS (SELECT CAST(max(abs(cov)) AS BIGINT) AS m FROM pc_f)",
        "pc_a AS MATERIALIZED (\n"
        "  SELECT i, j,\n"
        "    CAST((CAST(1000000 AS HUGEINT) * cov) // m AS BIGINT) AS a\n"
        "  FROM pc_f, pc_m)",
        "pc_v0 AS MATERIALIZED (\n"
        "  SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM pc_a)",
    ]
    for k in range(1, its + 1):
        parts.append(
            f"pc_w{k} AS MATERIALIZED (\n"
            f"  SELECT a.i, CAST(SUM(a.a * v.v) AS BIGINT) AS w\n"
            f"  FROM pc_a a JOIN pc_v{k - 1} v ON v.i = a.j GROUP BY a.i)"
        )
        parts.append(
            f"pc_v{k} AS MATERIALIZED (\n"
            f"  SELECT i, CAST(CASE WHEN m.mx = 0 THEN w ELSE\n"
            f"    (CAST(1000000 AS HUGEINT) * w) // m.mx END AS BIGINT)"
            f" AS v\n"
            f"  FROM pc_w{k},\n"
            f"    (SELECT CAST(max(abs(w)) AS BIGINT) AS mx"
            f" FROM pc_w{k}) m)"
        )
    last = f"pc_v{its}"
    parts.append(
        "pc_num AS (\n"
        "  SELECT CAST(SUM(CAST(va.v AS HUGEINT) * a.a * vb.v)"
        " AS HUGEINT) AS num\n"
        f"  FROM pc_a a JOIN {last} va ON va.i = a.i\n"
        f"  JOIN {last} vb ON vb.i = a.j)"
    )
    parts.append(
        f"pc_den AS (SELECT CAST(SUM(v * v) AS BIGINT) AS den"
        f" FROM {last})"
    )
    parts.append(
        "pc_tr AS (SELECT CAST(SUM(a) AS BIGINT) AS tr"
        " FROM pc_a WHERE i = j)"
    )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        "SELECT CAST(v.i AS BIGINT) AS pos,\n"
        "  CAST(v.v AS BIGINT) AS loading_micros,\n"
        "  CAST(CASE WHEN d.den > 0 AND t.tr > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * u.num)"
        " // (CAST(d.den AS HUGEINT) * t.tr)\n"
        "  END AS BIGINT) AS explained_ratio_micros,\n"
        "  n.n AS n_vecs\n"
        f"FROM {last} v, pc_num u, pc_den d, pc_tr t, co_n n"
    )


def hurst_rs_sql(window_sizes: tuple = (4, 8, 16)) -> str:
    """Mirror of operators.analytics.hurst_rs: zero-filled daily spine,
    w-scaled integer deviations, per-window R and Σdev², one rounded
    double per window, truncating per-size mean, integer-log OLS
    slope."""
    sizes = ", ".join(str(int(w)) for w in sorted(window_sizes))
    return (
        "WITH hrd AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "hrr AS (SELECT min(d) AS lo, max(d) AS hi FROM hrd),\n"
        "hrp AS MATERIALIZED (\n"
        "  SELECT CAST(s.d - s.lo AS BIGINT) AS x,\n"
        "    CAST(COALESCE(t.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d, lo FROM hrr) s\n"
        "  LEFT JOIN hrd t USING (d)),\n"
        "hrs AS MATERIALIZED (\n"
        "  SELECT CAST(u.w AS BIGINT) AS w, p.x, p.y, p.x // u.w AS g\n"
        f"  FROM hrp p, (SELECT unnest([{sizes}]) AS w) u),\n"
        "hrg AS MATERIALIZED (\n"
        "  SELECT w, g, CAST(sum(y) AS BIGINT) AS sw, count(*) AS cnt\n"
        "  FROM hrs GROUP BY w, g HAVING count(*) = w),\n"
        "hrv AS MATERIALIZED (\n"
        "  SELECT s.w, s.g, s.x,\n"
        "    CAST(s.w * s.y - g.sw AS BIGINT) AS dev\n"
        "  FROM hrs s JOIN hrg g USING (w, g)),\n"
        "hrz AS MATERIALIZED (\n"
        "  SELECT w, g, dev, sum(dev) OVER (PARTITION BY w, g ORDER BY x\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z\n"
        "  FROM hrv),\n"
        "hrw AS MATERIALIZED (\n"
        "  SELECT w, g, CAST(max(z) - min(z) AS BIGINT) AS r,\n"
        "    CAST(sum(dev * dev) AS BIGINT) AS ssd\n"
        "  FROM hrz GROUP BY w, g HAVING sum(dev * dev) > 0),\n"
        "hrx AS MATERIALIZED (\n"
        "  SELECT w, CAST(round(1000000.0 * r * sqrt(CAST(w AS DOUBLE))\n"
        "    / sqrt(CAST(ssd AS DOUBLE)), 0) AS BIGINT) AS rs\n"
        "  FROM hrw),\n"
        "hrm AS MATERIALIZED (\n"
        "  SELECT w, CAST(count(*) AS BIGINT) AS n_windows,\n"
        "    CAST(sum(rs) // count(*) AS BIGINT) AS mean_rs_micros\n"
        "  FROM hrx GROUP BY w),\n"
        "hrl AS MATERIALIZED (\n"
        "  SELECT w, n_windows, mean_rs_micros,\n"
        "    CAST(round(ln(CAST(w AS DOUBLE)) * 1000000, 0) AS BIGINT)"
        " AS lx,\n"
        "    CAST(round(ln(CAST(mean_rs_micros AS DOUBLE) / 1000000.0)\n"
        "      * 1000000, 0) AS BIGINT) AS ly\n"
        "  FROM hrm),\n"
        "hsl AS (SELECT\n"
        "  CASE WHEN count(*) >= 2\n"
        "    AND count(*) * sum(lx * lx) - sum(lx) * sum(lx) > 0 THEN\n"
        "    round(CAST(count(*) * sum(lx * ly) - sum(lx) * sum(ly)"
        " AS DOUBLE)\n"
        "      / CAST(count(*) * sum(lx * lx) - sum(lx) * sum(lx)"
        " AS DOUBLE), 6)\n"
        "  END AS hurst FROM hrl)\n"
        "SELECT m.w, m.n_windows, m.mean_rs_micros, s.hurst\n"
        "FROM hrm m, hsl s"
    )


def anova_oneway_sql(
    group_col: str = "event_type", value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.anova_oneway: per-group BIGINT
    moments (cents = round(100·value)), HUGEINT sums of the truncating
    S²/n terms, F and eta² as truncating-division micros — integer all
    the way, so the comparison is hash-exact with no float rounding."""
    return (
        "WITH av_p AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g, CAST(count(*) AS HUGEINT) AS n,\n"
        "    CAST(SUM(c) AS HUGEINT) AS s,"
        " CAST(SUM(c * c) AS HUGEINT) AS q\n"
        f"  FROM (SELECT {group_col},"
        f" CAST(round({value_col} * 100) AS BIGINT) AS c FROM events) t\n"
        f"  GROUP BY {group_col}),\n"
        "av_t AS MATERIALIZED (\n"
        "  SELECT CAST(count(*) AS HUGEINT) AS g, SUM(n) AS n_tot,\n"
        "    SUM(s) AS s_tot, SUM(q) AS q_tot,\n"
        "    SUM((s * s) // n) AS sb_terms\n"
        "  FROM av_p),\n"
        "av_x AS MATERIALIZED (\n"
        "  SELECT g, n_tot,\n"
        "    sb_terms - (s_tot * s_tot) // n_tot AS ssb,\n"
        "    q_tot - sb_terms AS ssw\n"
        "  FROM av_t WHERE g > 0)\n"
        "SELECT CAST(g AS BIGINT) AS n_groups,"
        " CAST(n_tot AS BIGINT) AS n_total,\n"
        "  CAST(ssb AS BIGINT) AS ssb_cents2,"
        " CAST(ssw AS BIGINT) AS ssw_cents2,\n"
        "  CAST(CASE WHEN g >= 2 AND n_tot > g AND ssw * (g - 1) > 0\n"
        "    THEN (1000000 * ssb * (n_tot - g)) // (ssw * (g - 1))\n"
        "    END AS BIGINT) AS f_stat_micros,\n"
        "  CAST(CASE WHEN ssb + ssw > 0\n"
        "    THEN (1000000 * ssb) // (ssb + ssw)\n"
        "    END AS BIGINT) AS eta_sq_micros\n"
        "FROM av_x"
    )


def mmr_topk_sql(
    k: int = 5, shortlist: int = 32, lam_milli: int = 700
) -> str:
    """Mirror of operators.similarity.mmr_topk: the shared micro-
    centroid CTEs, exact BIGINT distances, the shortlist as a
    (dq, vec_id) LIMIT, then k UNROLLED greedy steps — each step scores
    the remaining shortlist against the union of prior picks (min pair
    distance via the scalar-range list fold) and takes the
    (score, vec_id) minimum, exactly the engine's Python loop."""
    lam = int(lam_milli)
    pen = 1000 - lam
    pd = (
        "list_sum(list_transform(range(1, len(r.v) + 1),"
        " j -> (r.v[j] - s.v[j]) * (r.v[j] - s.v[j])))"
    )
    parts = [
        _CENTROID_CTES,
        "mm_d AS MATERIALIZED (SELECT vec_id, v,\n"
        "  CAST(list_sum(list_transform(range(1, len(v) + 1),\n"
        "    j -> (v[j] - cv[j]) * (v[j] - cv[j]))) AS BIGINT) AS dq\n"
        "  FROM co_q, co_cl)",
        "mm_s AS MATERIALIZED (SELECT * FROM mm_d\n"
        f"  ORDER BY dq, vec_id LIMIT {int(shortlist)})",
        "sel1 AS MATERIALIZED (SELECT vec_id, v, dq,\n"
        f"  CAST({lam} AS BIGINT) * dq AS score FROM mm_s\n"
        "  ORDER BY dq, vec_id LIMIT 1)",
        "selu1 AS MATERIALIZED (SELECT vec_id, v FROM sel1)",
    ]
    for i in range(2, int(k) + 1):
        parts.append(
            f"sc{i} AS (SELECT r.vec_id, r.v, r.dq,\n"
            f"  CAST({lam} AS BIGINT) * r.dq - CAST({pen} AS BIGINT)\n"
            f"    * MIN(CAST({pd} AS BIGINT)) AS score\n"
            f"  FROM mm_s r, selu{i - 1} s\n"
            f"  WHERE r.vec_id NOT IN (SELECT vec_id FROM selu{i - 1})\n"
            "  GROUP BY r.vec_id, r.v, r.dq)"
        )
        parts.append(
            f"sel{i} AS MATERIALIZED (SELECT vec_id, v, dq, score"
            f" FROM sc{i}\n  ORDER BY score, vec_id LIMIT 1)"
        )
        parts.append(
            f"selu{i} AS MATERIALIZED (SELECT vec_id, v FROM selu{i - 1}\n"
            f"  UNION ALL SELECT vec_id, v FROM sel{i})"
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS rank, vec_id, dq AS dist_q,\n"
        f"  CAST(score AS BIGINT) AS mmr_score FROM sel{i}"
        for i in range(1, int(k) + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "SELECT * FROM (\n" + union + "\n) u ORDER BY rank"
    )


def spearman_activity_value_sql(
    user_col: str = "user_id", value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.spearman_activity_value: per-user
    BIGINT (count, cents) pair, doubled average ranks via the distinct-
    value prefix window (2·cb + ct + 1), exact BIGINT Pearson moments
    over the doubled ranks, ρ as one rounded double with each variance
    factor cast to double before the product."""
    return (
        "WITH sp_u AS MATERIALIZED (\n"
        f"  SELECT {user_col} AS u, CAST(count(*) AS BIGINT) AS cnt,\n"
        f"    CAST(SUM(CAST(round({value_col} * 100) AS BIGINT))"
        " AS BIGINT) AS val\n"
        f"  FROM events GROUP BY {user_col}),\n"
        "sp_rx AS MATERIALIZED (\n"
        "  SELECT cnt, CAST(2 * COALESCE(SUM(ct) OVER (ORDER BY cnt\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ", 0) AS BIGINT) + ct + 1 AS rx\n"
        "  FROM (SELECT cnt, CAST(count(*) AS BIGINT) AS ct FROM sp_u\n"
        "        GROUP BY cnt) t),\n"
        "sp_ry AS MATERIALIZED (\n"
        "  SELECT val, CAST(2 * COALESCE(SUM(ct) OVER (ORDER BY val\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ", 0) AS BIGINT) + ct + 1 AS ry\n"
        "  FROM (SELECT val, CAST(count(*) AS BIGINT) AS ct FROM sp_u\n"
        "        GROUP BY val) t),\n"
        "sp_m AS MATERIALIZED (\n"
        "  SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "    CAST(SUM(rx) AS BIGINT) AS sx,"
        " CAST(SUM(ry) AS BIGINT) AS sy,\n"
        "    CAST(SUM(rx * rx) AS BIGINT) AS sxx,\n"
        "    CAST(SUM(ry * ry) AS BIGINT) AS syy,\n"
        "    CAST(SUM(rx * ry) AS BIGINT) AS sxy\n"
        "  FROM sp_u JOIN sp_rx USING (cnt) JOIN sp_ry USING (val))\n"
        "SELECT n AS n_users,\n"
        "  CAST(n * sxy - sx * sy AS BIGINT) AS num_xy,\n"
        "  CAST(n * sxx - sx * sx AS BIGINT) AS den_x,\n"
        "  CAST(n * syy - sy * sy AS BIGINT) AS den_y,\n"
        "  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0\n"
        "    THEN round((n * sxy - sx * sy) /\n"
        "      sqrt(CAST(n * sxx - sx * sx AS DOUBLE)\n"
        "        * CAST(n * syy - sy * sy AS DOUBLE)), 6)\n"
        "    END AS rho_spearman\n"
        "FROM sp_m WHERE n > 0"
    )


def binseg_changepoint_sql() -> str:
    """Mirror of operators.analytics.binseg_changepoint: the zero-
    filled day spine (hurst_rs device), BIGINT prefix sums, SSE as
    ``10⁶·Q − (10⁶·S²) // n`` per side, (sse, x) argmin via LIMIT 1."""
    return (
        "WITH bs_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "bs_r AS (SELECT min(d) AS lo, max(d) AS hi FROM bs_d),\n"
        "bs_p AS MATERIALIZED (\n"
        "  SELECT CAST(s.d - s.lo AS BIGINT) AS x,\n"
        "    CAST(COALESCE(t.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d, lo FROM bs_r) s\n"
        "  LEFT JOIN bs_d t USING (d)),\n"
        "bs_c AS MATERIALIZED (\n"
        "  SELECT x,\n"
        "    CAST(SUM(y) OVER (ORDER BY x) AS BIGINT) AS cs,\n"
        "    CAST(SUM(y * y) OVER (ORDER BY x) AS BIGINT) AS cq\n"
        "  FROM bs_p),\n"
        "bs_t AS (SELECT CAST(MAX(x) + 1 AS BIGINT) AS dd,\n"
        "    CAST(MAX(cs) AS BIGINT) AS s, CAST(MAX(cq) AS BIGINT) AS q\n"
        "  FROM bs_c)\n"
        "SELECT x AS split_x, dd AS n_days,\n"
        "  CAST(1000000 * q - (1000000 * s * s) // dd AS BIGINT)"
        " AS sse_total_micros,\n"
        "  CAST(1000000 * q - (1000000 * cs * cs) // (x + 1)\n"
        "    - (1000000 * (s - cs) * (s - cs)) // (dd - x - 1)"
        " AS BIGINT) AS sse_split_micros,\n"
        "  CAST((1000000 * s * s) // dd * -1\n"
        "    + (1000000 * cs * cs) // (x + 1)\n"
        "    + (1000000 * (s - cs) * (s - cs)) // (dd - x - 1)"
        " AS BIGINT) AS gain_micros,\n"
        "  CAST((1000000 * cs) // (x + 1) AS BIGINT)"
        " AS mean_left_micros,\n"
        "  CAST((1000000 * (s - cs)) // (dd - x - 1) AS BIGINT)"
        " AS mean_right_micros\n"
        "FROM bs_c, bs_t WHERE x + 1 < dd\n"
        "ORDER BY sse_split_micros, x LIMIT 1"
    )


def shapley_attribution_sql(conversion_type: str = "purchase") -> str:
    """Mirror of operators.temporal.shapley_attribution: bit-or user
    masks over alphabetically-indexed channels, the ≤2ⁿ (mask, count)
    table, v(S) by containment scan, and the exact n!-scaled Shapley
    sum via HUGEINT factorial()/bit_count() — '//' mirrors the
    engine's truncating division for phi_micros."""
    ct = conversion_type.replace("'", "''")
    return (
        "WITH sh_c AS MATERIALIZED (\n"
        "  SELECT t AS channel,\n"
        "    CAST(row_number() OVER (ORDER BY t) - 1 AS BIGINT) AS ci\n"
        "  FROM (SELECT DISTINCT event_type AS t FROM events\n"
        f"        WHERE event_type != '{ct}'"
        " AND event_type IS NOT NULL) d),\n"
        "sh_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh_c),\n"
        "sh_u AS MATERIALIZED (\n"
        "  SELECT e.user_id AS u,\n"
        "    CAST(COALESCE(bit_or(CASE WHEN c.ci IS NOT NULL\n"
        "      THEN (CAST(1 AS BIGINT) << c.ci) ELSE 0 END), 0)"
        " AS BIGINT) AS mask,\n"
        f"    MAX(CASE WHEN e.event_type = '{ct}' THEN 1 ELSE 0 END)"
        " AS conv\n"
        "  FROM events e LEFT JOIN sh_c c ON c.channel = e.event_type\n"
        "  GROUP BY e.user_id),\n"
        "sh_m AS MATERIALIZED (\n"
        "  SELECT mask, CAST(count(*) AS BIGINT) AS cnt FROM sh_u\n"
        "  WHERE conv = 1 GROUP BY mask),\n"
        "sh_s AS MATERIALIZED (\n"
        "  SELECT s.S,\n"
        "    (SELECT CAST(COALESCE(SUM(m.cnt), 0) AS HUGEINT)\n"
        "     FROM sh_m m WHERE (m.mask & ~s.S) = 0) AS v\n"
        "  FROM (SELECT unnest(range(0, (CAST(1 AS BIGINT) << n)))"
        " AS S FROM sh_n) s)\n"
        "SELECT c.channel, n.n AS n_channels,\n"
        "  CAST(SUM(factorial(bit_count(s.S))\n"
        "    * factorial(CAST(n.n AS INT) - 1 - bit_count(s.S))\n"
        "    * (v2.v - s.v)) AS BIGINT) AS phi_num,\n"
        "  CAST((1000000 * SUM(factorial(bit_count(s.S))\n"
        "    * factorial(CAST(n.n AS INT) - 1 - bit_count(s.S))\n"
        "    * (v2.v - s.v))) // factorial(CAST(n.n AS INT))"
        " AS BIGINT) AS phi_micros\n"
        "FROM sh_c c CROSS JOIN sh_n n CROSS JOIN sh_s s\n"
        "JOIN sh_s v2 ON v2.S = (s.S | (CAST(1 AS BIGINT) << c.ci))\n"
        "WHERE (s.S & (CAST(1 AS BIGINT) << c.ci)) = 0\n"
        "GROUP BY c.channel, n.n\n"
        "ORDER BY c.channel"
    )


def forecast_backtest_mase_sql(
    alpha_num: int = 1, alpha_den: int = 4
) -> str:
    """Mirror of operators.analytics.forecast_backtest_mase: the
    ewma_daily recursive fold as a nested subquery (a CTE body may
    open its own WITH RECURSIVE), then the lag-window naive error and
    the three truncating-division outputs."""
    return (
        "WITH mb AS MATERIALIZED (\n"
        f"  SELECT * FROM ({ewma_daily_sql(alpha_num, alpha_den)}) t),\n"
        "md AS (SELECT resid_micros,\n"
        "    1000000 * ABS(y - lag(y) OVER (ORDER BY d)) AS dn\n"
        "  FROM mb),\n"
        "ma AS (SELECT CAST(count(*) AS BIGINT) AS n_days,\n"
        "    CAST(SUM(ABS(resid_micros)) AS BIGINT) AS se,\n"
        "    CAST(SUM(dn) AS BIGINT) AS sn\n"
        "  FROM md)\n"
        "SELECT n_days,\n"
        "  CAST(CASE WHEN n_days > 1 THEN sn // (n_days - 1) END"
        " AS BIGINT) AS mae_naive_micros,\n"
        "  CAST(CASE WHEN n_days > 1 THEN se // (n_days - 1) END"
        " AS BIGINT) AS mae_ewma_micros,\n"
        "  CAST(CASE WHEN sn > 0 THEN (1000000 * se) // sn END"
        " AS BIGINT) AS mase_micros\n"
        "FROM ma"
    )


def ann_ndcg_sql(n_queries: int = 16, k: int = 10) -> str:
    """Mirror of operators.similarity.ann_ndcg: micro-quantized exact
    L2², per-query (d, nid) row_number rank, the SAME integer discount
    weights (embedded from _ndcg_weights — no float log in SQL),
    prefix-weight IDCG at min(k, n_rel), truncating-division NDCG."""
    from graphlite_spark.operators.similarity import _ndcg_weights

    w = _ndcg_weights(k)
    pw = [sum(w[: i + 1]) for i in range(k)]
    wl = ", ".join(str(x) for x in w)
    pwl = ", ".join(str(x) for x in pw)
    qz = (
        "SELECT vec_id, list_transform(embedding, x ->\n"
        "    CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        " AS v, label\n"
        "  FROM embeddings"
    )
    return (
        "WITH nd_z AS MATERIALIZED (" + qz + "),\n"
        "nd_q AS MATERIALIZED (SELECT * FROM nd_z"
        f" ORDER BY vec_id LIMIT {int(n_queries)}),\n"
        "nd_s AS MATERIALIZED (\n"
        "  SELECT q.vec_id AS query_id, c.vec_id AS nid,\n"
        "    CAST(list_sum(list_transform(range(1, len(q.v) + 1),\n"
        "      j -> (q.v[j] - c.v[j]) * (q.v[j] - c.v[j])))"
        " AS BIGINT) AS d,\n"
        "    CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS rel\n"
        "  FROM nd_q q, nd_z c WHERE c.vec_id != q.vec_id),\n"
        "nd_r AS MATERIALIZED (\n"
        "  SELECT query_id, rel, row_number() OVER\n"
        "    (PARTITION BY query_id ORDER BY d, nid) AS rank\n"
        "  FROM nd_s),\n"
        "nd_d AS MATERIALIZED (\n"
        f"  SELECT query_id, CAST(SUM(rel * ([{wl}])[CAST(rank AS INT)])"
        " AS BIGINT) AS dcg\n"
        f"  FROM nd_r WHERE rank <= {int(k)} GROUP BY query_id),\n"
        "nd_l AS (SELECT label, CAST(count(*) AS BIGINT) AS nlab\n"
        "  FROM embeddings GROUP BY label)\n"
        "SELECT q.vec_id AS query_id,\n"
        "  CAST(COALESCE(l.nlab, 1) - 1 AS BIGINT) AS n_rel,\n"
        "  CAST(COALESCE(d.dcg, 0) AS BIGINT) AS dcg,\n"
        "  CAST(CASE WHEN COALESCE(l.nlab, 1) - 1 > 0 THEN\n"
        f"    ([{pwl}])[CAST(LEAST({int(k)}, l.nlab - 1) AS INT)] END"
        " AS BIGINT) AS idcg,\n"
        "  CAST(CASE WHEN COALESCE(l.nlab, 1) - 1 > 0 THEN\n"
        "    (1000000 * COALESCE(d.dcg, 0))\n"
        f"      // ([{pwl}])[CAST(LEAST({int(k)}, l.nlab - 1) AS INT)]"
        " END AS BIGINT) AS ndcg_micros\n"
        "FROM nd_q q LEFT JOIN nd_l l ON l.label = q.label\n"
        "LEFT JOIN nd_d d ON d.query_id = q.vec_id"
    )


def rbo_activity_value_sql(
    depth: int = 20, p_num: int = 9, p_den: int = 10
) -> str:
    """Mirror of operators.analytics.rbo_activity_value: per-user
    BIGINT (count, cents), deterministic (metric DESC, user ASC)
    row_number ranks, per-depth overlap counts, and the geometric
    terms over PYTHON-PRECOMPUTED integer power lists (p_den^depth
    passes 9.2e18, so the literals parse as HUGEINT)."""
    d = int(depth)
    pn = ", ".join(str(p_num ** (i - 1)) for i in range(1, d + 1))
    pd = ", ".join(str(p_den ** i) for i in range(1, d + 1))
    return (
        "WITH rb_u AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS cnt,\n"
        "    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS val\n"
        "  FROM events GROUP BY user_id),\n"
        "rb_r AS MATERIALIZED (\n"
        "  SELECT row_number() OVER (ORDER BY cnt DESC, u) AS ra,\n"
        "    row_number() OVER (ORDER BY val DESC, u) AS rb\n"
        "  FROM rb_u),\n"
        "rb_o AS MATERIALIZED (\n"
        "  SELECT t.d, (SELECT CAST(count(*) AS BIGINT) FROM rb_r r\n"
        "    WHERE r.ra <= t.d AND r.rb <= t.d) AS overlap\n"
        f"  FROM (SELECT unnest(range(1, {d + 1})) AS d) t),\n"
        "rb_t AS MATERIALIZED (\n"
        "  SELECT d, overlap,\n"
        f"    CAST((1000000 * {int(p_den - p_num)}\n"
        f"      * CAST(([{pn}])[CAST(d AS INT)] AS HUGEINT) * overlap)\n"
        f"      // (([{pd}])[CAST(d AS INT)] * d) AS BIGINT)"
        " AS term_micros\n"
        "  FROM rb_o)\n"
        "SELECT d, overlap, term_micros,\n"
        "  CAST(SUM(term_micros) OVER (ORDER BY d) AS BIGINT)"
        " AS rbo_cum_micros\n"
        "FROM rb_t ORDER BY d"
    )


def spectral_gap_sql(iterations: int = 8) -> str:
    """Mirror of algos.centrality.spectral_gap_lambda2 over the user
    contact graph: symmetrized distinct contact edges, the
    hash48('sg:'||id)-spread ±10⁶ start vector, and ``iterations``
    unrolled rounds of gather
    (x // d summed over in-neighbors), degree-direction deflation
    (HUGEINT ``(10⁶·Σ y·d) // Σ d²``), and max-|·| renormalization —
    '//' mirrors Spark ``div`` toward zero (verified on negatives);
    the final Rayleigh quotient gives λ₂ and the gap."""
    its = int(iterations)
    parts = [
        "ev AS MATERIALIZED (SELECT event_id, user_id, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events)",
        "ce AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src, user_id AS dst\n"
        "  FROM ev) WHERE src IS NOT NULL AND src <> dst)",
        "un AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce))",
        "dg AS MATERIALIZED (SELECT src AS id,"
        " CAST(count(*) AS BIGINT) AS d FROM un GROUP BY src)",
        "sdd AS MATERIALIZED (SELECT CAST(SUM(CAST(d AS HUGEINT) * d)"
        " AS HUGEINT) AS sdd FROM dg)",
        "s0 AS MATERIALIZED (SELECT id, d,\n"
        "  CAST(CAST('0x' || substr(md5('sg:' || CAST(id AS VARCHAR)),"
        " 1, 12) AS BIGINT)\n"
        "    % 2000001 - 1000000 AS BIGINT) AS x FROM dg)",
    ]
    gather = (
        "{out} AS MATERIALIZED (\n"
        "  SELECT v.id, v.d, CAST(COALESCE(m.y, 0) AS BIGINT) AS y\n"
        "  FROM {src} v LEFT JOIN (\n"
        "    SELECT e.dst AS id, SUM(s.x // s.d) AS y\n"
        "    FROM un e JOIN {src} s ON s.id = e.src\n"
        "    GROUP BY e.dst) m USING (id))"
    )
    for t in range(1, its + 1):
        parts.append(gather.format(out=f"g{t}", src=f"s{t - 1}"))
        parts.append(
            f"c{t} AS (SELECT CAST((1000000 *"
            " SUM(CAST(y AS HUGEINT) * d))\n"
            "    // (SELECT sdd FROM sdd) AS HUGEINT) AS c"
            f" FROM g{t})"
        )
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT id, d,\n"
            "  CAST(y - (c * d) // 1000000 AS BIGINT) AS f\n"
            f"  FROM g{t}, c{t})"
        )
        parts.append(
            f"m{t} AS (SELECT CAST(MAX(ABS(f)) AS BIGINT) AS m"
            f" FROM f{t})"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT id, d,\n"
            "  CAST(CASE WHEN m > 0 THEN (1000000 * f) // m ELSE f END"
            " AS BIGINT) AS x\n"
            f"  FROM f{t}, m{t})"
        )
    parts.append(gather.format(out="zt", src=f"s{its}"))
    parts.append(
        f"fin AS (SELECT CAST(SUM(CAST(s.x AS HUGEINT) * z.y)"
        " AS HUGEINT) AS sxz,\n"
        "    CAST(SUM(CAST(s.x AS HUGEINT) * s.x) AS HUGEINT) AS sxx\n"
        f"  FROM s{its} s JOIN zt z USING (id))"
    )
    parts.append(
        "nvt AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM dg)"
    )
    parts.append(
        "net AS (SELECT CAST(count(*) // 2 AS BIGINT) AS ne FROM un)"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT nvt.nv AS n_vertices, net.ne AS n_edges_und,\n"
        "  CAST(CASE WHEN sxx > 0 THEN (1000000 * sxz) // sxx END"
        " AS BIGINT) AS slem_micros,\n"
        "  CAST(CASE WHEN sxx > 0 THEN\n"
        "    1000000 - ABS((1000000 * sxz) // sxx) END AS BIGINT)"
        " AS gap_micros\n"
        "FROM fin, nvt, net"
    )


def decision_stump_sql(k: int = 10) -> str:
    """Mirror of operators.similarity.decision_stump_dims: the shared
    micro-centroid CTEs as the per-dimension threshold, (pos, side,
    label) counts, per-side Gini ``10⁶ − (10⁶·Σc²) // n²``, weighted
    by side sizes, (score, pos) top-k."""
    return (
        f"WITH {_CENTROID_CTES},\n"
        "ds_s AS MATERIALIZED (\n"
        "  SELECT u.i - 1 AS pos,\n"
        "    CASE WHEN q.v[u.i] <= cl.cv[u.i] THEN 1 ELSE 0 END"
        " AS side, e.label\n"
        "  FROM co_q q JOIN embeddings e USING (vec_id), co_cl cl,\n"
        "    UNNEST(range(1, len(q.v) + 1)) AS u(i)),\n"
        "ds_c AS MATERIALIZED (\n"
        "  SELECT pos, side, label, CAST(count(*) AS BIGINT) AS c\n"
        "  FROM ds_s GROUP BY pos, side, label),\n"
        "ds_g AS MATERIALIZED (\n"
        "  SELECT pos, side, CAST(SUM(c) AS BIGINT) AS n,\n"
        "    CAST(1000000 - (1000000 * SUM(c * c)) // (SUM(c) * SUM(c))"
        " AS BIGINT) AS g\n"
        "  FROM ds_c GROUP BY pos, side),\n"
        "ds_w AS MATERIALIZED (\n"
        "  SELECT CAST(COALESCE(l.pos, r.pos) AS BIGINT) AS pos,\n"
        "    CAST(COALESCE(l.n, 0) AS BIGINT) AS n_left,\n"
        "    CAST(COALESCE(r.n, 0) AS BIGINT) AS n_right,\n"
        "    CAST((COALESCE(l.n, 0) * COALESCE(l.g, 0)\n"
        "      + COALESCE(r.n, 0) * COALESCE(r.g, 0))\n"
        "      // (COALESCE(l.n, 0) + COALESCE(r.n, 0)) AS BIGINT)"
        " AS gini_weighted_micros\n"
        "  FROM (SELECT * FROM ds_g WHERE side = 1) l\n"
        "  FULL JOIN (SELECT * FROM ds_g WHERE side = 0) r"
        " USING (pos))\n"
        "SELECT pos, n_left, n_right, gini_weighted_micros,\n"
        "  CAST(row_number() OVER (ORDER BY gini_weighted_micros, pos)"
        " AS INT) AS rank\n"
        f"FROM ds_w ORDER BY gini_weighted_micros, pos LIMIT {int(k)}"
    )


def seg_vopt_daily_sql() -> str:
    """Mirror of operators.analytics.seg_vopt_daily: the day spine +
    prefix sums, the exact BIGINT cost table cost(i,j) = 10⁶·ΔQ −
    (10⁶·ΔS²)//n, two DP layers with (score, split) row_number ties
    (== Spark's lexicographic struct minima), and the three segment
    rows reconstructed from the prefix table."""
    return (
        "WITH sv_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),\n"
        "sv_r AS (SELECT min(d) AS lo, max(d) AS hi FROM sv_d),\n"
        "sv_p AS MATERIALIZED (\n"
        "  SELECT CAST(s.d - s.lo AS BIGINT) AS x,\n"
        "    CAST(COALESCE(t.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d, lo FROM sv_r) s\n"
        "  LEFT JOIN sv_d t USING (d)),\n"
        "sv_c AS MATERIALIZED (\n"
        "  SELECT x, CAST(SUM(y) OVER (ORDER BY x) AS BIGINT) AS cs,\n"
        "    CAST(SUM(y * y) OVER (ORDER BY x) AS BIGINT) AS cq\n"
        "  FROM sv_p),\n"
        "sv_z AS MATERIALIZED (\n"
        "  SELECT x + 1 AS i, cs AS ps, cq AS pq FROM sv_c\n"
        "  UNION ALL SELECT 0, 0, 0),\n"
        "sv_t AS MATERIALIZED (\n"
        "  SELECT z.i, p.x AS j,\n"
        "    CAST(1000000 * (p.cq - z.pq)\n"
        "      - (1000000 * (p.cs - z.ps) * (p.cs - z.ps))"
        " // (p.x - z.i + 1) AS BIGINT) AS c\n"
        "  FROM sv_z z JOIN sv_c p ON z.i <= p.x),\n"
        "sv_n AS (SELECT CAST(max(x) AS BIGINT) AS last FROM sv_c),\n"
        "sv_1 AS MATERIALIZED (SELECT j, c AS v1 FROM sv_t"
        " WHERE i = 0),\n"
        "sv_2 AS MATERIALIZED (\n"
        "  SELECT j, v, s1 FROM (\n"
        "    SELECT b.j AS j, a.v1 + b.c AS v, a.j AS s1,\n"
        "      row_number() OVER (PARTITION BY b.j\n"
        "        ORDER BY a.v1 + b.c, a.j) AS rn\n"
        "    FROM sv_1 a JOIN sv_t b ON b.i = a.j + 1) t"
        " WHERE rn = 1),\n"
        "sv_f AS MATERIALIZED (\n"
        "  SELECT a.s1, a.j AS s2 FROM sv_2 a\n"
        "  JOIN sv_t b ON b.i = a.j + 1\n"
        "    AND b.j = (SELECT last FROM sv_n)\n"
        "  ORDER BY a.v + b.c, a.j LIMIT 1)\n"
        "SELECT * FROM (\n"
        "  SELECT CAST(1 AS BIGINT) AS seg, CAST(0 AS BIGINT)"
        " AS start_x,\n"
        "    f.s1 AS end_x, CAST(f.s1 + 1 AS BIGINT) AS n_days,\n"
        "    CAST((1000000 * p.cs) // (f.s1 + 1) AS BIGINT)"
        " AS mean_micros,\n"
        "    CAST(1000000 * p.cq - (1000000 * p.cs * p.cs)"
        " // (f.s1 + 1) AS BIGINT) AS sse_micros\n"
        "  FROM sv_f f JOIN sv_c p ON p.x = f.s1\n"
        "  UNION ALL\n"
        "  SELECT 2, f.s1 + 1, f.s2, CAST(f.s2 - f.s1 AS BIGINT),\n"
        "    CAST((1000000 * (p2.cs - p1.cs)) // (f.s2 - f.s1)"
        " AS BIGINT),\n"
        "    CAST(1000000 * (p2.cq - p1.cq)\n"
        "      - (1000000 * (p2.cs - p1.cs) * (p2.cs - p1.cs))"
        " // (f.s2 - f.s1) AS BIGINT)\n"
        "  FROM sv_f f JOIN sv_c p1 ON p1.x = f.s1\n"
        "  JOIN sv_c p2 ON p2.x = f.s2\n"
        "  UNION ALL\n"
        "  SELECT 3, f.s2 + 1, n.last,"
        " CAST(n.last - f.s2 AS BIGINT),\n"
        "    CAST((1000000 * (pt.cs - p2.cs)) // (n.last - f.s2)"
        " AS BIGINT),\n"
        "    CAST(1000000 * (pt.cq - p2.cq)\n"
        "      - (1000000 * (pt.cs - p2.cs) * (pt.cs - p2.cs))"
        " // (n.last - f.s2) AS BIGINT)\n"
        "  FROM sv_f f, sv_n n\n"
        "  JOIN sv_c p2 ON p2.x = f.s2\n"
        "  JOIN sv_c pt ON pt.x = n.last\n"
        ") u ORDER BY seg"
    )


def layer_multiplexity_sql() -> str:
    """Mirror of operators.temporal.layer_multiplexity: per-type lag
    contact arcs, canonical (least, greatest) DISTINCT und edges per
    layer, exact common/size counts, truncating micro Jaccard."""
    return (
        "WITH lm_e AS MATERIALIZED (SELECT event_id, user_id,"
        " event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "lm_a AS MATERIALIZED (\n"
        "  SELECT DISTINCT t, LEAST(p, q) AS u, GREATEST(p, q) AS v\n"
        "  FROM (SELECT event_type AS t,\n"
        "      lag(user_id) OVER (PARTITION BY event_type\n"
        "        ORDER BY ts_us, event_id) AS p,\n"
        "      user_id AS q FROM lm_e) s\n"
        "  WHERE p IS NOT NULL AND p <> q),\n"
        "lm_s AS MATERIALIZED (SELECT t,"
        " CAST(count(*) AS BIGINT) AS n FROM lm_a GROUP BY t),\n"
        "lm_c AS MATERIALIZED (\n"
        "  SELECT a.t AS type_a, b.t AS type_b,\n"
        "    CAST(count(*) AS BIGINT) AS n_common\n"
        "  FROM lm_a a JOIN lm_a b\n"
        "    ON a.u = b.u AND a.v = b.v AND a.t < b.t\n"
        "  GROUP BY a.t, b.t)\n"
        "SELECT x.t AS type_a, y.t AS type_b, x.n AS n_a, y.n AS n_b,\n"
        "  CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,\n"
        "  CAST((1000000 * COALESCE(c.n_common, 0))\n"
        "    // (x.n + y.n - COALESCE(c.n_common, 0)) AS BIGINT)"
        " AS jaccard_micros\n"
        "FROM lm_s x JOIN lm_s y ON x.t < y.t\n"
        "LEFT JOIN lm_c c ON c.type_a = x.t AND c.type_b = y.t\n"
        "WHERE x.n + y.n > 0"
    )


def diff_in_diff_sql(
    type_treat: str = "purchase", type_control: str = "click"
) -> str:
    """Mirror of operators.analytics.diff_in_diff: day offsets from
    the calendar minimum, mid = D // 2, four conditional BIGINT cells,
    truncating-division micros for each period mean and the DiD."""
    tt = type_treat.replace("'", "''")
    tc = type_control.replace("'", "''")
    return (
        "WITH dd_e AS MATERIALIZED (\n"
        "  SELECT event_type AS t,\n"
        "    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d\n"
        "  FROM events),\n"
        "dd_r AS (SELECT min(d) AS lo, max(d) AS hi FROM dd_e),\n"
        "dd_c AS (\n"
        "  SELECT CAST(r.hi - r.lo + 1 AS BIGINT) AS dd,\n"
        f"    CAST(SUM(CASE WHEN t = '{tt}'\n"
        "      AND e.d - r.lo < (r.hi - r.lo + 1) // 2"
        " THEN 1 ELSE 0 END) AS BIGINT) AS ta,\n"
        f"    CAST(SUM(CASE WHEN t = '{tt}'\n"
        "      AND e.d - r.lo >= (r.hi - r.lo + 1) // 2"
        " THEN 1 ELSE 0 END) AS BIGINT) AS tb,\n"
        f"    CAST(SUM(CASE WHEN t = '{tc}'\n"
        "      AND e.d - r.lo < (r.hi - r.lo + 1) // 2"
        " THEN 1 ELSE 0 END) AS BIGINT) AS ca,\n"
        f"    CAST(SUM(CASE WHEN t = '{tc}'\n"
        "      AND e.d - r.lo >= (r.hi - r.lo + 1) // 2"
        " THEN 1 ELSE 0 END) AS BIGINT) AS cb\n"
        "  FROM dd_e e, dd_r r GROUP BY r.hi, r.lo)\n"
        "SELECT dd AS n_days, CAST(dd // 2 AS BIGINT) AS split_x,\n"
        "  CAST((1000000 * ta) // (dd // 2) AS BIGINT)"
        " AS pre_treat_micros,\n"
        "  CAST((1000000 * tb) // (dd - dd // 2) AS BIGINT)"
        " AS post_treat_micros,\n"
        "  CAST((1000000 * ca) // (dd // 2) AS BIGINT)"
        " AS pre_ctrl_micros,\n"
        "  CAST((1000000 * cb) // (dd - dd // 2) AS BIGINT)"
        " AS post_ctrl_micros,\n"
        "  CAST(((1000000 * tb) // (dd - dd // 2)"
        " - (1000000 * ta) // (dd // 2))\n"
        "    - ((1000000 * cb) // (dd - dd // 2)"
        " - (1000000 * ca) // (dd // 2)) AS BIGINT) AS did_micros\n"
        "FROM dd_c WHERE dd >= 2"
    )


def embedding_mmd_sql(label_a: int = 0, label_b: int = 1) -> str:
    """Mirror of operators.similarity.embedding_mmd_labels: per-group
    (i, j) BIGINT moment sums over the upper triangle incl. the
    diagonal, mean entries as ``s // (n·10⁶)``, off-diagonal cells
    doubled, exact sum of squared differences."""
    return (
        "WITH mm_q AS MATERIALIZED (\n"
        f"  SELECT CASE WHEN label = {int(label_a)} THEN 1 ELSE 0 END"
        " AS ga,\n"
        "    list_transform(embedding, x ->\n"
        "      CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        " AS v\n"
        f"  FROM embeddings WHERE label IN ({int(label_a)},"
        f" {int(label_b)})),\n"
        "mm_m AS MATERIALIZED (\n"
        "  SELECT ga, ti.i AS i, tj.j AS j,\n"
        "    CAST(SUM(v[ti.i] * v[tj.j]) AS BIGINT) AS s,\n"
        "    CAST(count(*) AS BIGINT) AS n\n"
        "  FROM mm_q,\n"
        "    UNNEST(range(1, len(v) + 1)) AS ti(i),\n"
        "    UNNEST(range(1, len(v) + 1)) AS tj(j)\n"
        "  WHERE tj.j >= ti.i GROUP BY ga, ti.i, tj.j),\n"
        "mm_c AS MATERIALIZED (\n"
        "  SELECT COALESCE(a.s, 0) AS sa, COALESCE(b.s, 0) AS sb,\n"
        "    a.n AS na, b.n AS nb,\n"
        "    CASE WHEN COALESCE(a.j, b.j) > COALESCE(a.i, b.i)"
        " THEN 1 ELSE 0 END AS off\n"
        "  FROM (SELECT * FROM mm_m WHERE ga = 1) a\n"
        "  FULL JOIN (SELECT * FROM mm_m WHERE ga = 0) b\n"
        "    USING (i, j)),\n"
        "mm_n AS (SELECT CAST(MAX(na) AS BIGINT) AS gna,\n"
        "    CAST(MAX(nb) AS BIGINT) AS gnb FROM mm_c)\n"
        "SELECT gna AS n_a, gnb AS n_b,\n"
        "  CAST(SUM((1 + off)\n"
        "    * (sa // (gna * 1000000) - sb // (gnb * 1000000))\n"
        "    * (sa // (gna * 1000000) - sb // (gnb * 1000000)))"
        " AS BIGINT) AS mmd2_scaled\n"
        "FROM mm_c, mm_n GROUP BY gna, gnb"
    )


def logrank_purchasers_sql(treat_type: str = "purchase") -> str:
    """Mirror of operators.analytics.logrank_purchasers: per-unit
    lifetime + horizon censoring exactly as kaplan_meier_sql, the
    cross-multiplied above-average-share group flag (p_u*N > P*n_u),
    the dense (pooled time x group) grid,
    per-group descending at-risk cumsums, then the chained truncating
    micros divisions e = (1e6*d*na)//n, v = ((e*nb)//n*(n-d))//(n-1)
    (all operands non-negative, so // == Spark's div) and
    z2 = ome^2 // sum(v) (ome^2 >= 0)."""
    return (
        "WITH lr_per AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    min(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS first_d,\n"
        "    max(CAST(epoch_us(ts) AS BIGINT) // 86400000000)"
        " AS last_d,\n"
        "    CAST(count(*) AS BIGINT) AS n_u,\n"
        f"    CAST(sum(CASE WHEN event_type = '{treat_type}' THEN 1"
        " ELSE 0 END) AS BIGINT) AS p_u\n"
        "  FROM events GROUP BY 1),\n"
        "lr_hi AS (SELECT max(last_d) AS hi FROM lr_per),\n"
        "lr_tot AS (SELECT CAST(sum(n_u) AS BIGINT) AS nn,\n"
        "  CAST(sum(p_u) AS BIGINT) AS pp FROM lr_per),\n"
        "lr_durs AS MATERIALIZED (\n"
        "  SELECT CASE WHEN p_u * (SELECT nn FROM lr_tot)\n"
        "      > (SELECT pp FROM lr_tot) * n_u THEN 1 ELSE 0 END AS g,\n"
        "    last_d - first_d AS t,\n"
        "    CAST(count(*) AS BIGINT) AS c,\n"
        "    CAST(sum(CASE WHEN last_d = (SELECT hi FROM lr_hi)"
        " THEN 0 ELSE 1 END) AS BIGINT) AS d\n"
        "  FROM lr_per GROUP BY 1, 2),\n"
        "lr_grid AS MATERIALIZED (\n"
        "  SELECT gg.g, sp.t,\n"
        "    COALESCE(dd.c, 0) AS c, COALESCE(dd.d, 0) AS d\n"
        "  FROM (SELECT DISTINCT t FROM lr_durs) sp\n"
        "  CROSS JOIN (SELECT 0 AS g UNION ALL SELECT 1) gg\n"
        "  LEFT JOIN lr_durs dd ON dd.g = gg.g AND dd.t = sp.t),\n"
        "lr_risk AS MATERIALIZED (\n"
        "  SELECT g, t, d,\n"
        "    CAST(sum(c) OVER (PARTITION BY g ORDER BY t DESC\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS n\n"
        "  FROM lr_grid),\n"
        "lr_times AS MATERIALIZED (\n"
        "  SELECT a.t, a.d AS da, b.d AS db,\n"
        "    CAST((1000000 * (a.d + b.d) * a.n) // (a.n + b.n)"
        " AS BIGINT) AS e,\n"
        "    a.n AS na, b.n AS nb,\n"
        "    a.d + b.d AS dt, a.n + b.n AS nt\n"
        "  FROM (SELECT * FROM lr_risk WHERE g = 1) a\n"
        "  JOIN (SELECT * FROM lr_risk WHERE g = 0) b ON a.t = b.t\n"
        "  WHERE a.d + b.d > 0 AND a.n + b.n >= 2),\n"
        "lr_v AS MATERIALIZED (\n"
        "  SELECT t, da, db, e,\n"
        "    CAST((((e * nb) // nt) * (nt - dt)) // (nt - 1)"
        " AS BIGINT) AS v\n"
        "  FROM lr_times),\n"
        "lr_agg AS (\n"
        "  SELECT CAST(count(*) AS BIGINT) AS n_times,\n"
        "    CAST(sum(da) AS BIGINT) AS deaths_a,\n"
        "    CAST(sum(db) AS BIGINT) AS deaths_b,\n"
        "    CAST(sum(e) AS BIGINT) AS expected_a_micros,\n"
        "    CAST(sum(v) AS BIGINT) AS var_micros\n"
        "  FROM lr_v)\n"
        "SELECT n_times, deaths_a, deaths_b, expected_a_micros,\n"
        "  var_micros,\n"
        "  CASE WHEN var_micros > 0 THEN CAST(\n"
        "    ((1000000 * deaths_a - expected_a_micros)\n"
        "     * (1000000 * deaths_a - expected_a_micros))\n"
        "    // var_micros AS BIGINT) ELSE NULL END AS z2_micros\n"
        "FROM lr_agg"
    )


def kendall_tau_daily_sql() -> str:
    """Mirror of operators.analytics.kendall_tau_daily: the daily
    (volume, distinct-user) aggregate, the d1 < d2 pair join, the
    concordant/discordant/tie cells, and tau_a via the remainder-
    subtract division (cd may be NEGATIVE: both engines give %
    the dividend's sign, and the subtracted form divides an exact
    multiple, so floor // == Spark's toward-zero div)."""
    return (
        "WITH kt_daily AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS x,\n"
        "    CAST(count(DISTINCT user_id) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "kt_pairs AS MATERIALIZED (\n"
        "  SELECT (p2.x - p1.x) * (p2.y - p1.y) AS prod,\n"
        "    CASE WHEN p1.x = p2.x THEN 1 ELSE 0 END AS tx,\n"
        "    CASE WHEN p1.y = p2.y THEN 1 ELSE 0 END AS ty\n"
        "  FROM kt_daily p1 JOIN kt_daily p2 ON p1.d < p2.d),\n"
        "kt_agg AS (\n"
        "  SELECT CAST(count(*) AS BIGINT) AS n_pairs,\n"
        "    CAST(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS concordant,\n"
        "    CAST(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS discordant,\n"
        "    CAST(sum(CASE WHEN tx = 1 AND ty = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS ties_x,\n"
        "    CAST(sum(CASE WHEN tx = 0 AND ty = 1 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS ties_y,\n"
        "    CAST(sum(CASE WHEN tx = 1 AND ty = 1 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS ties_both\n"
        "  FROM kt_pairs)\n"
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM kt_daily)"
        " AS n_days,\n"
        "  n_pairs, concordant, discordant, ties_x, ties_y,"
        " ties_both,\n"
        "  CASE WHEN n_pairs > 0 THEN CAST(\n"
        "    (1000000 * (concordant - discordant)\n"
        "     - (1000000 * (concordant - discordant)) % n_pairs)\n"
        "    // n_pairs AS BIGINT) ELSE NULL END AS tau_a_micros\n"
        "FROM kt_agg"
    )


def degree_centralization_sql() -> str:
    """Mirror of algos.stats.degree_centralization: und-closure degrees
    (the non-RECURSIVE und CTE dedups correctly — the CLAUDE.md
    RECURSIVE-UNION trap does not apply here), n*dmax - sum(d), one
    truncating micros division (numerator non-negative by max)."""
    return _graph_query(
        ", dc_dg AS MATERIALIZED (\n"
        "  SELECT src, CAST(count(*) AS BIGINT) AS d\n"
        "  FROM und GROUP BY src),\n"
        "dc_s AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(max(d) AS BIGINT) AS dmax,\n"
        "  CAST(sum(d) AS BIGINT) AS sd FROM dc_dg)\n"
        "SELECT n AS n_vertices, dmax AS max_degree,\n"
        "  CAST(n * dmax - sd AS BIGINT) AS sum_diff,\n"
        "  CASE WHEN n >= 3 THEN CAST(\n"
        "    (1000000 * (n * dmax - sd)) // ((n - 1) * (n - 2))\n"
        "    AS BIGINT) ELSE NULL END AS centralization_micros\n"
        "FROM dc_s"
    )


def cohens_kappa_langid_sql(
    labels: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
) -> str:
    """Mirror of operators.classify.cohens_kappa_langid: the full
    naive_bayes_confusion_sql as a nested-WITH CTE body (DuckDB allows
    it — CLAUDE.md), marginal products, and the remainder-subtract
    kappa division (numerator may be negative; both engines give %
    the dividend's sign, and the subtracted form divides an exact
    multiple)."""
    conf = naive_bayes_confusion_sql(labels=labels)
    return (
        f"WITH ck_conf AS MATERIALIZED ({conf}),\n"
        "ck_r AS (SELECT true_label AS l, CAST(sum(n) AS BIGINT) AS r\n"
        "  FROM ck_conf GROUP BY 1),\n"
        "ck_c AS (SELECT pred_label AS l, CAST(sum(n) AS BIGINT) AS c\n"
        "  FROM ck_conf GROUP BY 1),\n"
        "ck_m AS (SELECT COALESCE(r.r, 0) AS r, COALESCE(c.c, 0) AS c\n"
        "  FROM ck_r r FULL JOIN ck_c c ON c.l = r.l),\n"
        "ck_s AS (SELECT CAST(sum(r * c) AS BIGINT) AS sum_rc,\n"
        "  CAST(sum(r) AS BIGINT) AS nn FROM ck_m),\n"
        "ck_d AS (SELECT CAST(sum(CASE WHEN true_label = pred_label\n"
        "  THEN n ELSE 0 END) AS BIGINT) AS n_agree FROM ck_conf)\n"
        "SELECT nn AS n_eval, n_agree,\n"
        "  CAST((1000000 * n_agree) // nn AS BIGINT) AS po_micros,\n"
        "  CAST((1000000 * sum_rc) // (nn * nn) AS BIGINT)"
        " AS pe_micros,\n"
        "  CASE WHEN nn * nn - sum_rc > 0 THEN CAST(\n"
        "    (1000000 * (nn * n_agree - sum_rc)\n"
        "     - (1000000 * (nn * n_agree - sum_rc))"
        " % (nn * nn - sum_rc))\n"
        "    // (nn * nn - sum_rc) AS BIGINT)\n"
        "  ELSE NULL END AS kappa_micros\n"
        "FROM ck_d, ck_s"
    )


def ann_map_sql(n_queries: int = 16, k: int = 10) -> str:
    """Mirror of operators.similarity.ann_map: ann_ndcg_sql's
    quantize/score/rank scaffolding, the running-hits window, the
    per-term truncating precision (1e6*hits)//i, and AP as the
    truncating division of the term sum by min(k, n_rel) — every
    floor placed exactly where the Spark side places it."""
    qz = (
        "SELECT vec_id, list_transform(embedding, x ->\n"
        "    CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        " AS v, label\n"
        "  FROM embeddings"
    )
    return (
        "WITH ap_z AS MATERIALIZED (" + qz + "),\n"
        "ap_q AS MATERIALIZED (SELECT * FROM ap_z"
        f" ORDER BY vec_id LIMIT {int(n_queries)}),\n"
        "ap_s AS MATERIALIZED (\n"
        "  SELECT q.vec_id AS query_id, c.vec_id AS nid,\n"
        "    CAST(list_sum(list_transform(range(1, len(q.v) + 1),\n"
        "      j -> (q.v[j] - c.v[j]) * (q.v[j] - c.v[j])))"
        " AS BIGINT) AS d,\n"
        "    CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS rel\n"
        "  FROM ap_q q, ap_z c WHERE c.vec_id != q.vec_id),\n"
        "ap_r AS MATERIALIZED (\n"
        "  SELECT query_id, rel, row_number() OVER\n"
        "    (PARTITION BY query_id ORDER BY d, nid) AS rank\n"
        "  FROM ap_s),\n"
        "ap_t AS MATERIALIZED (\n"
        "  SELECT query_id, rel,\n"
        "    CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rank\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS hits,\n"
        "    CAST(rank AS BIGINT) AS i\n"
        f"  FROM ap_r WHERE rank <= {int(k)}),\n"
        "ap_p AS MATERIALIZED (\n"
        "  SELECT query_id,\n"
        "    CAST(sum(rel * ((1000000 * hits) // i)) AS BIGINT)"
        " AS sap,\n"
        "    CAST(max(rel * hits) AS BIGINT) AS n_hits\n"
        "  FROM ap_t GROUP BY query_id),\n"
        "ap_l AS (SELECT label, CAST(count(*) AS BIGINT) AS nlab\n"
        "  FROM embeddings GROUP BY label)\n"
        "SELECT q.vec_id AS query_id,\n"
        "  CAST(COALESCE(l.nlab, 1) - 1 AS BIGINT) AS n_rel,\n"
        "  CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,\n"
        "  CASE WHEN COALESCE(l.nlab, 1) - 1 > 0 THEN CAST(\n"
        "    COALESCE(p.sap, 0)\n"
        f"      // LEAST({int(k)}, l.nlab - 1) AS BIGINT)\n"
        "  ELSE NULL END AS ap_micros\n"
        "FROM ap_q q LEFT JOIN ap_l l ON l.label = q.label\n"
        "LEFT JOIN ap_p p ON p.query_id = q.vec_id"
    )


def cramers_v2_sql() -> str:
    """Mirror of operators.analytics.cramers_v2_type_dow: the full
    chi_square_type_dow_sql as a nested-WITH CTE body, then one more
    truncating division by N * min(r-1, c-1) (all non-negative)."""
    chi = chi_square_type_dow_sql()
    return (
        f"WITH cv_chi AS MATERIALIZED ({chi}),\n"
        "cv_n AS (SELECT CAST(count(*) AS BIGINT) AS n_events"
        " FROM events)\n"
        "SELECT n_events, dof,\n"
        "  CAST(LEAST(n_types - 1, n_dows - 1) AS BIGINT) AS k_min,\n"
        "  CASE WHEN n_events * LEAST(n_types - 1, n_dows - 1) > 0\n"
        "    THEN CAST(chi2_micros\n"
        "      // (n_events * LEAST(n_types - 1, n_dows - 1))"
        " AS BIGINT)\n"
        "  ELSE NULL END AS v2_micros\n"
        "FROM cv_chi, cv_n"
    )


def morans_i_activity_sql() -> str:
    """Mirror of operators.analytics.morans_i_activity: the contact-
    edge lag window + undirected closure (plain UNION ALL + DISTINCT,
    no RECURSIVE, so dedup is safe), n-scaled deviations, and the
    remainder-subtract micros division (numerator may be negative)."""
    return (
        "WITH mi_ev AS MATERIALIZED (SELECT event_id, user_id,"
        " event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),\n"
        "mi_ce AS MATERIALIZED (SELECT src, dst FROM (\n"
        "  SELECT lag(user_id) OVER (PARTITION BY event_type\n"
        "           ORDER BY ts_us, event_id) AS src, user_id AS dst\n"
        "  FROM mi_ev) WHERE src IS NOT NULL AND src <> dst),\n"
        "mi_und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (\n"
        "  SELECT src, dst FROM mi_ce\n"
        "  UNION ALL SELECT dst, src FROM mi_ce)),\n"
        "mi_v AS MATERIALIZED (SELECT DISTINCT src AS u FROM mi_und),\n"
        "mi_x AS MATERIALIZED (\n"
        "  SELECT e.user_id AS u, CAST(count(*) AS BIGINT) AS x\n"
        "  FROM mi_ev e JOIN mi_v v ON v.u = e.user_id\n"
        "  GROUP BY e.user_id),\n"
        "mi_t AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(x) AS BIGINT) AS s FROM mi_x),\n"
        "mi_d AS MATERIALIZED (\n"
        "  SELECT u, (SELECT n FROM mi_t) * x - (SELECT s FROM mi_t)"
        " AS dv\n"
        "  FROM mi_x),\n"
        "mi_den AS (SELECT CAST(sum(dv * dv) AS BIGINT) AS den1"
        " FROM mi_d),\n"
        "mi_e AS (SELECT CAST(sum(a.dv * b.dv) AS BIGINT) AS nume,\n"
        "  CAST(count(*) AS BIGINT) AS w\n"
        "  FROM mi_und j JOIN mi_d a ON a.u = j.src\n"
        "  JOIN mi_d b ON b.u = j.dst)\n"
        "SELECT (SELECT n FROM mi_t) AS n_vertices, w AS w_edges,\n"
        "  CAST((SELECT n FROM mi_t) * nume AS BIGINT) AS num_scaled,\n"
        "  CAST(w * den1 AS BIGINT) AS den_scaled,\n"
        "  CASE WHEN w * den1 > 0 THEN CAST(\n"
        "    (1000000 * (SELECT n FROM mi_t) * nume\n"
        "     - (1000000 * (SELECT n FROM mi_t) * nume)"
        " % (w * den1))\n"
        "    // (w * den1) AS BIGINT) ELSE NULL END"
        " AS morans_i_micros\n"
        "FROM mi_e, mi_den"
    )


def assoc_rules_types_sql() -> str:
    """Mirror of operators.analytics.assoc_rules_types: distinct
    per-user baskets, ordered-pair equi-join on user, codebook
    marginals, three truncating micros divisions (all operands
    non-negative)."""
    return (
        "WITH ar_ut AS MATERIALIZED (\n"
        "  SELECT DISTINCT user_id AS u, event_type AS t FROM events),\n"
        "ar_nt AS (SELECT t, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM ar_ut GROUP BY t),\n"
        "ar_nn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nn\n"
        "  FROM ar_ut),\n"
        "ar_ab AS MATERIALIZED (\n"
        "  SELECT a.t AS type_a, b.t AS type_b,\n"
        "    CAST(count(*) AS BIGINT) AS n_ab\n"
        "  FROM ar_ut a JOIN ar_ut b ON b.u = a.u AND b.t <> a.t\n"
        "  GROUP BY 1, 2)\n"
        "SELECT type_a, type_b, n_ab,\n"
        "  CAST((1000000 * n_ab) // nn AS BIGINT) AS support_micros,\n"
        "  CAST((1000000 * n_ab) // na.n AS BIGINT)"
        " AS confidence_micros,\n"
        "  CAST((1000000 * nn * n_ab) // (na.n * nb.n) AS BIGINT)"
        " AS lift_micros\n"
        "FROM ar_ab\n"
        "JOIN ar_nt na ON na.t = ar_ab.type_a\n"
        "JOIN ar_nt nb ON nb.t = ar_ab.type_b\n"
        "CROSS JOIN ar_nn"
    )


def yules_k_sql() -> str:
    """Mirror of operators.packing.yules_k: the shared tokenizer CTE,
    one term-frequency aggregate, and the two-step quotient/remainder
    micros split (the chi-square discipline; operands non-negative)."""
    return (
        f"WITH {TOKS_CTE},\n"
        "yk_tf AS MATERIALIZED (\n"
        "  SELECT term, CAST(count(*) AS BIGINT) AS tf FROM (\n"
        "    SELECT unnest(toks) AS term FROM toks_t)\n"
        "  GROUP BY term),\n"
        "yk_a AS (SELECT CAST(sum(tf) AS BIGINT) AS n_tokens,\n"
        "  CAST(count(*) AS BIGINT) AS vocab_size,\n"
        "  CAST(sum(tf * tf) AS BIGINT) AS sum_tf2 FROM yk_tf)\n"
        "SELECT n_tokens, vocab_size, sum_tf2,\n"
        "  CASE WHEN n_tokens > 0 THEN CAST(\n"
        "    1000000 * ((10000 * (sum_tf2 - n_tokens))\n"
        "      // (n_tokens * n_tokens))\n"
        "    + (1000000 * ((10000 * (sum_tf2 - n_tokens))\n"
        "      % (n_tokens * n_tokens)))\n"
        "      // (n_tokens * n_tokens) AS BIGINT)\n"
        "  ELSE NULL END AS yule_k_micros\n"
        "FROM yk_a"
    )


def emd_type_daily_sql(
    type_a: str = "purchase", type_b: str = "click"
) -> str:
    """Mirror of operators.analytics.emd_type_daily: the (day, type)
    cells, occupied-day spine with gap weights (lead - d, last row 1),
    scaled |CDF| differences, one truncating micros division (all
    operands non-negative)."""
    return (
        "WITH em_c AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        f"    CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END AS g,\n"
        "    CAST(count(*) AS BIGINT) AS c\n"
        f"  FROM events WHERE event_type IN ('{type_a}', '{type_b}')\n"
        "  GROUP BY 1, 2),\n"
        "em_s AS MATERIALIZED (\n"
        "  SELECT d,\n"
        "    CAST(sum(CASE WHEN g = 1 THEN c ELSE 0 END) AS BIGINT)"
        " AS ca,\n"
        "    CAST(sum(CASE WHEN g = 0 THEN c ELSE 0 END) AS BIGINT)"
        " AS cb\n"
        "  FROM em_c GROUP BY d),\n"
        "em_u AS MATERIALIZED (\n"
        "  SELECT d,\n"
        "    CAST(sum(ca) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS cua,\n"
        "    CAST(sum(cb) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS cub,\n"
        "    CAST(COALESCE(lead(d) OVER (ORDER BY d) - d, 1)"
        " AS BIGINT) AS gap\n"
        "  FROM em_s),\n"
        "em_t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,\n"
        "  CAST(sum(cb) AS BIGINT) AS nb,\n"
        "  CAST(count(*) AS BIGINT) AS n_spine_days FROM em_s)\n"
        "SELECT na AS n_a, nb AS n_b, n_spine_days,\n"
        "  CAST(sum(abs(cua * nb - cub * na) * gap) AS BIGINT)"
        " AS emd_scaled,\n"
        "  CASE WHEN na * nb > 0 THEN CAST(\n"
        "    (1000000 * sum(abs(cua * nb - cub * na) * gap))"
        " // (na * nb)\n"
        "    AS BIGINT) ELSE NULL END AS emd_micros\n"
        "FROM em_u, em_t GROUP BY na, nb, n_spine_days"
    )


def cyclomatic_number_sql() -> str:
    """Mirror of algos.stats.cyclomatic_number: m from the und closure
    (re-SELECT DISTINCT before counting — the RECURSIVE-UNION dedup
    trap documented in CLAUDE.md), c from the recursive min-label
    reach, n over all vertices (isolates included)."""
    body = (
        ", cy_reach(id, r) AS (\n"
        "  SELECT id, id FROM vertices\n"
        "  UNION\n"
        "  SELECT u.dst, cy_reach.r FROM cy_reach"
        " JOIN und u ON u.src = cy_reach.id),\n"
        "cy_c AS (SELECT CAST(count(DISTINCT comp) AS BIGINT)"
        " AS n_components FROM (\n"
        "  SELECT id, min(r) AS comp FROM cy_reach GROUP BY id)),\n"
        "cy_m AS (SELECT CAST(count(*) // 2 AS BIGINT) AS m_edges\n"
        "  FROM (SELECT DISTINCT src, dst FROM und)),\n"
        "cy_n AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices"
        " FROM vertices)\n"
        "SELECT n_vertices, m_edges, n_components,\n"
        "  CAST(m_edges - n_vertices + n_components AS BIGINT)"
        " AS cyclomatic\n"
        "FROM cy_n, cy_m, cy_c"
    )
    return _graph_query(body, recursive=True)


def mcnemar_langid_sql(
    labels: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
) -> str:
    """Mirror of operators.classify.mcnemar_langid: the shared
    prediction CTEs, the majority-train-label baseline via
    (count DESC, label DESC) row_number (== struct max), discordant
    cells, one truncating micros division ((b-c)^2 >= 0)."""
    return (
        _naive_bayes_pred_ctes(labels)
        + ",\nmcn_maj AS (SELECT y AS baseline FROM (\n"
        "  SELECT y, row_number() OVER (ORDER BY count(*) DESC,"
        " y DESC) AS rk\n"
        "  FROM nbtr GROUP BY y) WHERE rk = 1),\n"
        "mcn_f AS MATERIALIZED (\n"
        "  SELECT CASE WHEN cand = true_label THEN 1 ELSE 0 END"
        " AS a_ok,\n"
        "    CASE WHEN (SELECT baseline FROM mcn_maj) = true_label\n"
        "      THEN 1 ELSE 0 END AS b_ok\n"
        "  FROM nbpred WHERE rk = 1),\n"
        "mcn_a AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,\n"
        "  CAST(sum(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_b,\n"
        "  CAST(sum(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_c\n"
        "  FROM mcn_f)\n"
        "SELECT n_eval, n_b, n_c,\n"
        "  CASE WHEN n_b + n_c > 0 THEN CAST(\n"
        "    (1000000 * (n_b - n_c) * (n_b - n_c)) // (n_b + n_c)\n"
        "    AS BIGINT) ELSE NULL END AS mcnemar_micros\n"
        "FROM mcn_a"
    )


def cmh_purchase_value_sql(
    type_a: str = "purchase", type_b: str = "click"
) -> str:
    """Mirror of operators.analytics.cmh_purchase_value: weekday
    strata, cross-multiplied above-mean cents flag, per-stratum 2x2
    margins, the chained truncating e/v divisions (log-rank
    discipline), final OmE^2 // sum(v)."""
    return (
        "WITH cm_src AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS dow,\n"
        f"    CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END"
        " AS exp,\n"
        "    CAST(round(value * 100) AS BIGINT) AS cents\n"
        f"  FROM events WHERE event_type IN ('{type_a}',"
        f" '{type_b}')),\n"
        "cm_t AS (SELECT CAST(count(*) AS BIGINT) AS nn,\n"
        "  CAST(sum(cents) AS BIGINT) AS sc FROM cm_src),\n"
        "cm_cells AS MATERIALIZED (\n"
        "  SELECT dow,\n"
        "    CAST(sum(exp * hi) AS BIGINT) AS a,\n"
        "    CAST(sum(exp) AS BIGINT) AS n1,\n"
        "    CAST(sum(1 - exp) AS BIGINT) AS n0,\n"
        "    CAST(sum(hi) AS BIGINT) AS m1,\n"
        "    CAST(sum(1 - hi) AS BIGINT) AS m0,\n"
        "    CAST(count(*) AS BIGINT) AS t\n"
        "  FROM (SELECT dow, exp,\n"
        "    CASE WHEN cents * (SELECT nn FROM cm_t)"
        " > (SELECT sc FROM cm_t)\n"
        "      THEN 1 ELSE 0 END AS hi FROM cm_src)\n"
        "  GROUP BY dow HAVING count(*) >= 2),\n"
        "cm_terms AS MATERIALIZED (\n"
        "  SELECT a, e,\n"
        "    CAST((((e * n0) // t) * m0) // (t - 1) AS BIGINT) AS v\n"
        "  FROM (SELECT a, CAST((1000000 * n1 * m1) // t AS BIGINT)"
        " AS e, n0, m0, t FROM cm_cells)),\n"
        "cm_agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,\n"
        "  CAST(sum(a) AS BIGINT) AS sum_a,\n"
        "  CAST(sum(e) AS BIGINT) AS sum_e_micros,\n"
        "  CAST(sum(v) AS BIGINT) AS sum_v_micros FROM cm_terms)\n"
        "SELECT n_strata, sum_a, sum_e_micros, sum_v_micros,\n"
        "  CASE WHEN sum_v_micros > 0 THEN CAST(\n"
        "    ((1000000 * sum_a - sum_e_micros)\n"
        "     * (1000000 * sum_a - sum_e_micros)) // sum_v_micros\n"
        "    AS BIGINT) ELSE NULL END AS cmh_micros\n"
        "FROM cm_agg"
    )


def ccf_type_daily_sql(
    type_a: str = "purchase", type_b: str = "click", max_lag: int = 7
) -> str:
    """Mirror of operators.analytics.ccf_type_daily: shared zero-filled
    spine, two n-scaled deviation series, the signed lag equi-join, and
    the signed-square HUGEINT ratio (the quotient operand num^2*1e6 /
    (den_a*den_b) is non-negative; the sign is applied outside, exactly
    as the Spark CASE does)."""
    L = int(max_lag)
    return (
        "WITH cf_c AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        f"    CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END AS g,\n"
        "    CAST(count(*) AS BIGINT) AS c\n"
        f"  FROM events WHERE event_type IN ('{type_a}', '{type_b}')\n"
        "  GROUP BY 1, 2),\n"
        "cf_r AS (SELECT min(d) AS lo, max(d) AS hi,\n"
        "  CAST(sum(CASE WHEN g = 1 THEN c ELSE 0 END) AS BIGINT)"
        " AS sa,\n"
        "  CAST(sum(CASE WHEN g = 0 THEN c ELSE 0 END) AS BIGINT)"
        " AS sb\n"
        "  FROM cf_c),\n"
        "cf_s AS MATERIALIZED (\n"
        "  SELECT unnest(range(lo, hi + 1)) AS d,\n"
        "    CAST(hi - lo + 1 AS BIGINT) AS n, sa, sb FROM cf_r),\n"
        "cf_v AS MATERIALIZED (\n"
        "  SELECT sp.d,\n"
        "    CAST(sp.n * COALESCE(ga.c, 0) - sp.sa AS BIGINT)"
        " AS dev_a,\n"
        "    CAST(sp.n * COALESCE(gb.c, 0) - sp.sb AS BIGINT)"
        " AS dev_b,\n"
        "    sp.n\n"
        "  FROM cf_s sp\n"
        "  LEFT JOIN (SELECT d, c FROM cf_c WHERE g = 1) ga"
        " USING (d)\n"
        "  LEFT JOIN (SELECT d, c FROM cf_c WHERE g = 0) gb"
        " USING (d)),\n"
        "cf_den AS (SELECT CAST(sum(dev_a * dev_a) AS BIGINT)"
        " AS den_a,\n"
        "  CAST(sum(dev_b * dev_b) AS BIGINT) AS den_b,\n"
        "  max(n) AS n FROM cf_v),\n"
        "cf_num AS MATERIALIZED (\n"
        "  SELECT l.lag, CAST(sum(a.dev_a * b.dev_b) AS BIGINT)"
        " AS num\n"
        f"  FROM cf_v a CROSS JOIN (SELECT unnest(range(-{L},"
        f" {L + 1})) AS lag) l\n"
        "  JOIN cf_v b ON b.d = a.d + l.lag\n"
        "  GROUP BY l.lag)\n"
        "SELECT CAST(m.lag AS INT) AS lag, q.n AS n_days,\n"
        "  m.num AS num_scaled,\n"
        "  CAST(CASE WHEN q.den_a > 0 AND q.den_b > 0 THEN\n"
        "    CASE WHEN m.num >= 0 THEN\n"
        "      (CAST(m.num AS HUGEINT) * m.num * 1000000)\n"
        "      // (CAST(q.den_a AS HUGEINT) * q.den_b)\n"
        "    ELSE -((CAST(m.num AS HUGEINT) * m.num * 1000000)\n"
        "      // (CAST(q.den_a AS HUGEINT) * q.den_b)) END\n"
        "  END AS BIGINT) AS ccf2_signed_micros\n"
        "FROM cf_num m, cf_den q"
    )


def brier_purchase_forecast_sql(target: str = "purchase") -> str:
    """Mirror of operators.analytics.brier_purchase_forecast: the
    diff_in_diff midpoint split, per-user first-half share in micros,
    second-half binary outcome, one truncating division (operands
    non-negative)."""
    return (
        "WITH bf_t AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        f"    CASE WHEN event_type = '{target}' THEN 1 ELSE 0 END"
        " AS t\n"
        "  FROM events),\n"
        "bf_r AS (SELECT min(d) AS lo, max(d) AS hi FROM bf_t),\n"
        "bf_j AS MATERIALIZED (\n"
        "  SELECT u, t,\n"
        "    CASE WHEN d - (SELECT lo FROM bf_r)\n"
        "      < ((SELECT hi FROM bf_r) - (SELECT lo FROM bf_r) + 1)"
        " // 2\n"
        "      THEN 1 ELSE 0 END AS pre\n"
        "  FROM bf_t),\n"
        "bf_f AS MATERIALIZED (\n"
        "  SELECT u, CAST(count(*) AS BIGINT) AS n_u,\n"
        "    CAST(sum(t) AS BIGINT) AS k_u\n"
        "  FROM bf_j WHERE pre = 1 GROUP BY u),\n"
        "bf_s AS MATERIALIZED (\n"
        "  SELECT u, CAST(max(t) AS BIGINT) AS y\n"
        "  FROM bf_j WHERE pre = 0 GROUP BY u),\n"
        "bf_p AS MATERIALIZED (\n"
        "  SELECT CAST((1000000 * f.k_u) // f.n_u AS BIGINT) AS p,\n"
        "    CAST(COALESCE(s.y, 0) AS BIGINT) AS y\n"
        "  FROM bf_f f LEFT JOIN bf_s s ON s.u = f.u),\n"
        "bf_a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,\n"
        "  CAST(sum(y) AS BIGINT) AS n_positive,\n"
        "  CAST(sum((p - 1000000 * y) * (p - 1000000 * y))"
        " AS BIGINT) AS sq\n"
        "  FROM bf_p)\n"
        "SELECT n_users, n_positive,\n"
        "  CASE WHEN n_users > 0 THEN\n"
        "    CAST(sq // (1000000 * n_users) AS BIGINT) END"
        " AS brier_micros,\n"
        "  CASE WHEN n_users > 0 THEN\n"
        "    CAST((1000000 * n_positive) // n_users AS BIGINT) END"
        " AS base_rate_micros\n"
        "FROM bf_a"
    )


def seq_patterns_subseq_sql() -> str:
    """Mirror of operators.analytics.seq_patterns_subseq: per-user
    (ts, event_id) position window, per-(user, type) first/last,
    the first(a) < last(b) pair test, the strictly-between triple
    test over the alphabet grid, one truncating micros division."""
    return (
        "WITH sq_s AS MATERIALIZED (\n"
        "  SELECT user_id AS u, event_type AS t,\n"
        "    CAST(row_number() OVER (PARTITION BY user_id\n"
        "      ORDER BY ts, event_id) AS BIGINT) AS pos\n"
        "  FROM events),\n"
        "sq_fl AS MATERIALIZED (\n"
        "  SELECT u, t, min(pos) AS first_p, max(pos) AS last_p\n"
        "  FROM sq_s GROUP BY u, t),\n"
        "sq_n AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nn"
        " FROM sq_s),\n"
        "sq_pairs AS MATERIALIZED (\n"
        "  SELECT fa.t AS a, lb.t AS b, CAST(NULL AS VARCHAR) AS c,\n"
        "    CAST(count(DISTINCT fa.u) AS BIGINT) AS n_users\n"
        "  FROM sq_fl fa JOIN sq_fl lb ON lb.u = fa.u\n"
        "    AND fa.first_p < lb.last_p\n"
        "  GROUP BY 1, 2),\n"
        "sq_tri AS MATERIALIZED (\n"
        "  SELECT g.a, m.t AS b, g.c,\n"
        "    CAST(count(DISTINCT g.u) AS BIGINT) AS n_users\n"
        "  FROM (\n"
        "    SELECT fa.u, fa.t AS a, lc.t AS c,\n"
        "      fa.first_p AS pa, lc.last_p AS lc\n"
        "    FROM sq_fl fa JOIN sq_fl lc ON lc.u = fa.u\n"
        "      AND fa.first_p + 1 < lc.last_p) g\n"
        "  JOIN sq_s m ON m.u = g.u\n"
        "    AND m.pos > g.pa AND m.pos < g.lc\n"
        "  GROUP BY 1, 2, 3)\n"
        "SELECT a, b, c, n_users,\n"
        "  CAST((1000000 * n_users) // (SELECT nn FROM sq_n)"
        " AS BIGINT) AS support_micros\n"
        "FROM (SELECT * FROM sq_pairs UNION ALL SELECT * FROM sq_tri)"
    )


def hapax_profile_sql() -> str:
    """Mirror of operators.packing.hapax_profile: the shared tokenizer
    CTE, one tf aggregate, two truncating micros divisions."""
    return (
        f"WITH {TOKS_CTE},\n"
        "hp_tf AS MATERIALIZED (\n"
        "  SELECT term, CAST(count(*) AS BIGINT) AS tf FROM (\n"
        "    SELECT unnest(toks) AS term FROM toks_t)\n"
        "  GROUP BY term),\n"
        "hp_a AS (SELECT CAST(sum(tf) AS BIGINT) AS n_tokens,\n"
        "  CAST(count(*) AS BIGINT) AS vocab_size,\n"
        "  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS hapax,\n"
        "  CAST(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS dis\n"
        "  FROM hp_tf)\n"
        "SELECT n_tokens, vocab_size, hapax, dis,\n"
        "  CASE WHEN vocab_size > 0 THEN\n"
        "    CAST((1000000 * hapax) // vocab_size AS BIGINT) END\n"
        "    AS hapax_share_micros,\n"
        "  CASE WHEN vocab_size > 0 THEN\n"
        "    CAST((1000000 * dis) // vocab_size AS BIGINT) END\n"
        "    AS sichel_s_micros\n"
        "FROM hp_a"
    )


def dow_adjusted_anomaly_sql(top_k: int = 10) -> str:
    """Mirror of operators.analytics.dow_adjusted_anomaly: zero-filled
    spine, weekday marginals, the (1e6*n_w*y)//S_w ratio, and the
    |1e6 - ratio| DESC, d ASC row_number top-k."""
    return (
        "WITH da_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "da_r AS (SELECT min(d) AS lo, max(d) AS hi FROM da_d),\n"
        "da_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y,\n"
        "    CAST((sp.d + 3) % 7 AS INT) AS dow\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM da_r) sp\n"
        "  LEFT JOIN da_d dl USING (d)),\n"
        "da_m AS (SELECT dow, CAST(count(*) AS BIGINT) AS dow_days,\n"
        "  CAST(sum(y) AS BIGINT) AS s_w FROM da_f GROUP BY dow),\n"
        "da_s AS MATERIALIZED (\n"
        "  SELECT f.d, f.dow, f.y, m.dow_days,\n"
        "    CASE WHEN m.s_w > 0 THEN\n"
        "      CAST((1000000 * m.dow_days * f.y) // m.s_w AS BIGINT)"
        " END AS ratio_micros\n"
        "  FROM da_f f JOIN da_m m USING (dow))\n"
        "SELECT d, dow, y, dow_days, ratio_micros,\n"
        "  CAST(rank AS INT) AS rank FROM (\n"
        "  SELECT *, row_number() OVER (ORDER BY\n"
        "    abs(1000000 - COALESCE(ratio_micros, 0)) DESC, d ASC)"
        " AS rank\n"
        "  FROM da_s)\n"
        f"WHERE rank <= {int(top_k)}"
    )


def mann_kendall_daily_sql() -> str:
    """Mirror of operators.analytics.mann_kendall_daily: zero-filled
    spine, the sign pair join, tie-corrected variance, HUGEINT Z²
    (18e6*S^2 // var18_raw; S^2 >= 0)."""
    return (
        "WITH mk_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "mk_r AS (SELECT min(d) AS lo, max(d) AS hi FROM mk_d),\n"
        "mk_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM mk_r) sp\n"
        "  LEFT JOIN mk_d dl USING (d)),\n"
        "mk_s AS (SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1\n"
        "    WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat\n"
        "  FROM mk_f a JOIN mk_f b ON a.d < b.d),\n"
        "mk_t AS (SELECT\n"
        "  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)"
        " AS tie_term,\n"
        "  CAST(sum(t) AS BIGINT) AS n FROM (\n"
        "    SELECT CAST(count(*) AS BIGINT) AS t FROM mk_f"
        " GROUP BY y))\n"
        "SELECT n AS n_days, s_stat,\n"
        "  CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT)"
        " AS var18_raw,\n"
        "  CAST(CASE WHEN n * (n - 1) * (2 * n + 5) - tie_term > 0"
        " THEN\n"
        "    (CAST(s_stat AS HUGEINT) * s_stat * 18000000)\n"
        "    // CAST(n * (n - 1) * (2 * n + 5) - tie_term AS HUGEINT)\n"
        "  END AS BIGINT) AS z2_micros\n"
        "FROM mk_s, mk_t"
    )


def gains_purchase_deciles_sql(
    target: str = "purchase", buckets: int = 10
) -> str:
    """Mirror of operators.analytics.gains_purchase_deciles: the
    brier per-user (p, y) shape, (p DESC, u ASC) row_number, the RFM
    closed-form bucket rule, running cum_pos, two truncating micros
    divisions."""
    B = int(buckets)
    return (
        "WITH gd_t AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        f"    CASE WHEN event_type = '{target}' THEN 1 ELSE 0 END"
        " AS t\n"
        "  FROM events),\n"
        "gd_r AS (SELECT min(d) AS lo, max(d) AS hi FROM gd_t),\n"
        "gd_j AS MATERIALIZED (\n"
        "  SELECT u, t,\n"
        "    CASE WHEN d - (SELECT lo FROM gd_r)\n"
        "      < ((SELECT hi FROM gd_r) - (SELECT lo FROM gd_r) + 1)"
        " // 2\n"
        "      THEN 1 ELSE 0 END AS pre\n"
        "  FROM gd_t),\n"
        "gd_f AS MATERIALIZED (\n"
        "  SELECT u, CAST(count(*) AS BIGINT) AS n_u,\n"
        "    CAST(sum(t) AS BIGINT) AS k_u\n"
        "  FROM gd_j WHERE pre = 1 GROUP BY u),\n"
        "gd_s AS MATERIALIZED (\n"
        "  SELECT u, CAST(max(t) AS BIGINT) AS y\n"
        "  FROM gd_j WHERE pre = 0 GROUP BY u),\n"
        "gd_p AS MATERIALIZED (\n"
        "  SELECT f.u,\n"
        "    CAST((1000000 * f.k_u) // f.n_u AS BIGINT) AS p,\n"
        "    CAST(COALESCE(s.y, 0) AS BIGINT) AS y\n"
        "  FROM gd_f f LEFT JOIN gd_s s ON s.u = f.u),\n"
        "gd_n AS (SELECT CAST(count(*) AS BIGINT) AS nn,\n"
        "  CAST(sum(y) AS BIGINT) AS tot_pos FROM gd_p),\n"
        "gd_d AS MATERIALIZED (\n"
        "  SELECT CAST(((row_number() OVER (ORDER BY p DESC, u ASC)"
        f" - 1) * {B})\n"
        "      // (SELECT nn FROM gd_n) + 1 AS INT) AS decile, y\n"
        "  FROM gd_p),\n"
        "gd_g AS MATERIALIZED (\n"
        "  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,\n"
        "    CAST(sum(y) AS BIGINT) AS n_pos\n"
        "  FROM gd_d GROUP BY decile)\n"
        "SELECT decile, n_users, n_pos,\n"
        "  CAST(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        " AS cum_pos,\n"
        "  CASE WHEN (SELECT tot_pos FROM gd_n) > 0 THEN CAST(\n"
        "    (1000000 * sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND CURRENT ROW))\n"
        "    // (SELECT tot_pos FROM gd_n) AS BIGINT) END"
        " AS gain_micros,\n"
        "  CASE WHEN (SELECT tot_pos FROM gd_n) * n_users > 0"
        " THEN CAST(\n"
        "    (1000000 * (SELECT nn FROM gd_n) * n_pos)\n"
        "    // ((SELECT tot_pos FROM gd_n) * n_users) AS BIGINT) END"
        " AS lift_micros\n"
        "FROM gd_g"
    )


def lorenz_value_deciles_sql(buckets: int = 10) -> str:
    """Mirror of operators.analytics.lorenz_value_deciles: per-user
    cents totals, (tot, u) row_number, the RFM closed-form bucket
    rule, cumulative windows, two truncating micros divisions."""
    B = int(buckets)
    return (
        "WITH lz_p AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS tot\n"
        "  FROM events GROUP BY 1),\n"
        "lz_n AS (SELECT CAST(count(*) AS BIGINT) AS nn,\n"
        "  CAST(sum(tot) AS BIGINT) AS grand FROM lz_p),\n"
        "lz_d AS MATERIALIZED (\n"
        "  SELECT CAST(((row_number() OVER (ORDER BY tot ASC, u ASC)"
        f" - 1) * {B})\n"
        "      // (SELECT nn FROM lz_n) + 1 AS INT) AS decile, tot\n"
        "  FROM lz_p),\n"
        "lz_g AS MATERIALIZED (\n"
        "  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,\n"
        "    CAST(sum(tot) AS BIGINT) AS decile_value_cents\n"
        "  FROM lz_d GROUP BY decile)\n"
        "SELECT decile, n_users, decile_value_cents,\n"
        "  CAST((1000000 * sum(n_users) OVER (ORDER BY decile"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))\n"
        "    // (SELECT nn FROM lz_n) AS BIGINT) AS cum_users_micros,\n"
        "  CASE WHEN (SELECT grand FROM lz_n) > 0 THEN CAST(\n"
        "    (1000000 * sum(decile_value_cents) OVER (ORDER BY decile"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))\n"
        "    // (SELECT grand FROM lz_n) AS BIGINT) END"
        " AS cum_value_micros\n"
        "FROM lz_g"
    )


def runs_test_daily_sql() -> str:
    """Mirror of operators.analytics.runs_test_daily: zero-filled
    spine, lower-median rank rule, equal-to-median days dropped,
    lag run boundaries, the all-integer z2 identity on HUGEINT."""
    return (
        "WITH rt_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "rt_r AS (SELECT min(d) AS lo, max(d) AS hi FROM rt_d),\n"
        "rt_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM rt_r) sp\n"
        "  LEFT JOIN rt_d dl USING (d)),\n"
        "rt_m AS (SELECT y AS med FROM (\n"
        "  SELECT y, row_number() OVER (ORDER BY y ASC, d ASC) AS rn,\n"
        "    CAST(count(*) OVER () AS BIGINT) AS n FROM rt_f)\n"
        "  WHERE rn = (n + n % 2) // 2),\n"
        "rt_s AS MATERIALIZED (\n"
        "  SELECT d, CASE WHEN y > (SELECT med FROM rt_m)"
        " THEN 1 ELSE 0 END AS s\n"
        "  FROM rt_f WHERE y <> (SELECT med FROM rt_m)),\n"
        "rt_a AS (SELECT CAST(sum(s) AS BIGINT) AS a,\n"
        "  CAST(sum(1 - s) AS BIGINT) AS b,\n"
        "  CAST(sum(CASE WHEN ps IS NULL OR ps <> s THEN 1 ELSE 0 END)"
        " AS BIGINT) AS runs\n"
        "  FROM (SELECT s, lag(s) OVER (ORDER BY d) AS ps FROM rt_s))\n"
        "SELECT a AS n_above, b AS n_below, runs,\n"
        "  CAST(CASE WHEN a > 0 AND b > 0 AND 2 * a * b > a + b THEN\n"
        "    (CAST(runs * (a + b) - (a + b) - 2 * a * b AS HUGEINT)\n"
        "     * (runs * (a + b) - (a + b) - 2 * a * b)\n"
        "     * (a + b - 1) * 1000000)\n"
        "    // CAST(2 * a * b * (2 * a * b - (a + b)) AS HUGEINT)\n"
        "  END AS BIGINT) AS z2_micros\n"
        "FROM rt_a"
    )


def brown_forsythe_sql(
    group_col: str = "event_type", value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.brown_forsythe: per-group lower
    median (rank rule), absolute cents deviations, then exactly the
    anova_oneway HUGEINT moment algebra on the deviations."""
    return (
        "WITH bf_v AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,"
        f" CAST(round({value_col} * 100) AS BIGINT) AS c FROM events),\n"
        "bf_m AS MATERIALIZED (SELECT g, c AS med FROM (\n"
        "  SELECT g, c,\n"
        "    row_number() OVER (PARTITION BY g ORDER BY c ASC) AS rn,\n"
        "    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n\n"
        "  FROM bf_v) t WHERE rn = (n + n % 2) // 2),\n"
        "bf_z AS MATERIALIZED (\n"
        "  SELECT v.g, CAST(abs(v.c - m.med) AS BIGINT) AS z\n"
        "  FROM bf_v v JOIN bf_m m ON m.g = v.g),\n"
        "bf_p AS MATERIALIZED (\n"
        "  SELECT g, CAST(count(*) AS HUGEINT) AS n,\n"
        "    CAST(sum(z) AS HUGEINT) AS s,"
        " CAST(sum(z * z) AS HUGEINT) AS q\n"
        "  FROM bf_z GROUP BY g),\n"
        "bf_t AS MATERIALIZED (\n"
        "  SELECT CAST(count(*) AS HUGEINT) AS g, SUM(n) AS n_tot,\n"
        "    SUM(s) AS s_tot, SUM(q) AS q_tot,\n"
        "    SUM((s * s) // n) AS sb_terms\n"
        "  FROM bf_p),\n"
        "bf_x AS MATERIALIZED (\n"
        "  SELECT g, n_tot,\n"
        "    sb_terms - (s_tot * s_tot) // n_tot AS ssb,\n"
        "    q_tot - sb_terms AS ssw\n"
        "  FROM bf_t WHERE g > 0)\n"
        "SELECT CAST(g AS BIGINT) AS n_groups,"
        " CAST(n_tot AS BIGINT) AS n_total,\n"
        "  CAST(ssb AS BIGINT) AS ssb_dev,"
        " CAST(ssw AS BIGINT) AS ssw_dev,\n"
        "  CAST(CASE WHEN g >= 2 AND n_tot > g AND ssw * (g - 1) > 0\n"
        "    THEN (1000000 * ssb * (n_tot - g)) // (ssw * (g - 1))\n"
        "    END AS BIGINT) AS f_bf_micros\n"
        "FROM bf_x"
    )


def linkpred_average_precision_sql(max_wedge_degree: int = 100) -> str:
    """Mirror of algos.linkpred.linkpred_average_precision over the
    contact graph: same wedge candidates as linkpred_auc_sql, the
    (score DESC, u, v) total order, per-term truncating Precision@k,
    truncating mean."""
    return f"""
WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,
  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
ce0 AS MATERIALIZED (SELECT src, dst FROM (
  SELECT lag(user_id) OVER (PARTITION BY event_type
           ORDER BY ts_us, event_id) AS src,
         user_id AS dst FROM ev)
  WHERE src IS NOT NULL AND src <> dst),
und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM ce0 UNION ALL SELECT dst AS src, src AS dst FROM ce0)
  WHERE src <> dst),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg
  FROM und GROUP BY 1),
ctr AS (SELECT src AS w FROM deg WHERE deg >= 2 AND deg <= {max_wedge_degree}),
pairs AS MATERIALIZED (
  SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM und e1 JOIN ctr c ON c.w = e1.src JOIN und e2 ON e2.src = e1.src
  WHERE e1.dst < e2.dst GROUP BY 1, 2),
scored AS MATERIALIZED (
  SELECT p.u, p.v,
         (1000000 * p.cn) // (du.deg + dv.deg - p.cn) AS score,
         CASE WHEN x.src IS NOT NULL THEN 1 ELSE 0 END AS pos
  FROM pairs p
  LEFT JOIN und x ON x.src = p.u AND x.dst = p.v
  JOIN deg du ON du.src = p.u JOIN deg dv ON dv.src = p.v),
ranked AS MATERIALIZED (
  SELECT pos,
    CAST(row_number() OVER (ORDER BY score DESC, u ASC, v ASC)
         AS BIGINT) AS k,
    CAST(sum(pos) OVER (ORDER BY score DESC, u ASC, v ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_pos
  FROM scored),
agg AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(count(*) AS BIGINT) AS n_cand,
               CAST(sum(CASE WHEN pos = 1
                    THEN (1000000 * cum_pos) // k END) AS BIGINT) AS ap_sum
  FROM ranked)
SELECT CAST(COALESCE(n_pos, 0) AS BIGINT) AS n_pos, n_cand,
  CAST(CASE WHEN n_pos > 0 THEN ap_sum // n_pos END AS BIGINT) AS ap_micros
FROM agg
"""


def simrank_wedge_sql(
    c_micros: int = 800_000, max_wedge_degree: int = 100
) -> str:
    """Mirror of algos.linkpred.simrank_wedge over the contact graph:
    the linkpred und/deg chain, capped wedge pairs, the two unrolled
    support-pruned SimRank iterations with truncating micros
    divisions (all numerators nonnegative, so ``//`` == Spark div)."""
    C = int(c_micros)
    return f"""
WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_type,
  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
ce0 AS MATERIALIZED (SELECT src, dst FROM (
  SELECT lag(user_id) OVER (PARTITION BY event_type
           ORDER BY ts_us, event_id) AS src,
         user_id AS dst FROM ev)
  WHERE src IS NOT NULL AND src <> dst),
und AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM ce0 UNION ALL SELECT dst AS src, src AS dst FROM ce0)
  WHERE src <> dst),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg
  FROM und GROUP BY 1),
ctr AS (SELECT src AS w FROM deg
  WHERE deg >= 2 AND deg <= {max_wedge_degree}),
pairs AS MATERIALIZED (
  SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn
  FROM und e1 JOIN ctr c ON c.w = e1.src JOIN und e2 ON e2.src = e1.src
  WHERE e1.dst < e2.dst GROUP BY 1, 2),
s1 AS MATERIALIZED (
  SELECT p.u, p.v, p.cn, du.deg AS du, dv.deg AS dv,
    CAST(({C} * p.cn) // (du.deg * dv.deg) AS BIGINT) AS s1_micros
  FROM pairs p
  JOIN deg du ON du.src = p.u JOIN deg dv ON dv.src = p.v),
s1b AS MATERIALIZED (
  SELECT u AS i, v AS j, s1_micros AS s FROM s1
  UNION ALL SELECT v AS i, u AS j, s1_micros AS s FROM s1),
off AS MATERIALIZED (
  SELECT ea.src AS u, eb.src AS v, CAST(sum(t.s) AS BIGINT) AS off_sum
  FROM und ea JOIN s1b t ON t.i = ea.dst
  JOIN und eb ON eb.dst = t.j
  WHERE ea.src < eb.src GROUP BY 1, 2)
SELECT s1.u, s1.v, s1.s1_micros,
  CAST(({C} * (1000000 * s1.cn + COALESCE(o.off_sum, 0)))
    // (s1.du * s1.dv * 1000000) AS BIGINT) AS s2_micros
FROM s1 LEFT JOIN off o ON o.u = s1.u AND o.v = s1.v
"""


def page_hinkley_daily_sql(
    delta_micros: int = 0, lambda_micros: int = 50_000_000
) -> str:
    """Mirror of operators.analytics.page_hinkley_daily: zero-filled
    daily spine, running truncating mean (nonnegative numerator),
    cumulative deviation sum, running minimum, threshold alarm."""
    return (
        "WITH ph_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "ph_r AS (SELECT min(d) AS lo, max(d) AS hi FROM ph_d),\n"
        "ph_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM ph_r) sp\n"
        "  LEFT JOIN ph_d dl USING (d)),\n"
        "ph_t AS MATERIALIZED (\n"
        "  SELECT d, y, CAST(1000000 * y\n"
        "    - (1000000 * sum(y) OVER wc) // (count(*) OVER wc)\n"
        f"    - {int(delta_micros)} AS BIGINT) AS term\n"
        "  FROM ph_f WINDOW wc AS (ORDER BY d ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW)),\n"
        "ph_c AS MATERIALIZED (\n"
        "  SELECT d, y, CAST(sum(term) OVER (ORDER BY d ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m\n"
        "  FROM ph_t)\n"
        "SELECT d, y,\n"
        "  CAST(m - min(m) OVER wc AS BIGINT) AS ph_micros,\n"
        "  CAST(CASE WHEN m - min(m) OVER wc"
        f" > {int(lambda_micros)} THEN 1 ELSE 0 END AS INT) AS alarm\n"
        "FROM ph_c WINDOW wc AS (ORDER BY d ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW)"
    )


def friedman_event_ranks_sql() -> str:
    """Mirror of operators.analytics.friedman_event_ranks: calendar
    spine x global type vocabulary zero-fill, doubled average ranks
    per day (2*cb + ct + 1), the tie-corrected all-integer chi-square
    identity on HUGEINT with truncating micros division."""
    return (
        "WITH fr_c AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    event_type AS t, CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1, 2),\n"
        "fr_r AS (SELECT min(d) AS lo, max(d) AS hi FROM fr_c),\n"
        "fr_ty AS MATERIALIZED (SELECT DISTINCT t FROM fr_c),\n"
        "fr_f AS MATERIALIZED (\n"
        "  SELECT sp.d, ty.t, CAST(COALESCE(c.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM fr_r) sp\n"
        "  CROSS JOIN fr_ty ty\n"
        "  LEFT JOIN fr_c c ON c.d = sp.d AND c.t = ty.t),\n"
        "fr_g AS MATERIALIZED (\n"
        "  SELECT d, y, CAST(count(*) AS BIGINT) AS ct\n"
        "  FROM fr_f GROUP BY d, y),\n"
        "fr_v AS MATERIALIZED (\n"
        "  SELECT d, y, CAST(2 * COALESCE(sum(ct) OVER (PARTITION BY d\n"
        "      ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " 1 PRECEDING), 0) + ct + 1 AS BIGINT) AS r2\n"
        "  FROM fr_g),\n"
        "fr_k AS MATERIALIZED (\n"
        "  SELECT f.d, f.t, v.r2\n"
        "  FROM fr_f f JOIN fr_v v ON v.d = f.d AND v.y = f.y),\n"
        "fr_j AS (SELECT CAST(sum(s_j * s_j) AS BIGINT) AS ssq FROM (\n"
        "  SELECT t, CAST(sum(r2) AS BIGINT) AS s_j\n"
        "  FROM fr_k GROUP BY t)),\n"
        "fr_t AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS rsq,\n"
        "  CAST(count(DISTINCT d) AS BIGINT) AS n,\n"
        "  CAST(count(DISTINCT t) AS BIGINT) AS k FROM fr_k)\n"
        "SELECT n AS n_days, k AS k_types, ssq AS rank_sq_sum,\n"
        "  CAST(rsq - n * k * (k + 1) * (k + 1) AS BIGINT)"
        " AS denom_raw,\n"
        "  CAST(CASE WHEN k >= 2\n"
        "      AND rsq - n * k * (k + 1) * (k + 1) > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * (k - 1)\n"
        "     * (ssq - n * n * k * (k + 1) * (k + 1)))\n"
        "    // CAST(rsq - n * k * (k + 1) * (k + 1) AS HUGEINT)\n"
        "  END AS BIGINT) AS chi2_micros\n"
        "FROM fr_t, fr_j"
    )


def calinski_harabasz_sql(
    k: int = 4, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.calinski_harabasz: the shared
    unrolled-Lloyd CTEs, final assignment via the (d2, cl) row rule,
    per-pos truncating grand centroid, SSB over NON-EMPTY clusters,
    and the variance-ratio as a HUGEINT truncating micros division
    (nonnegative throughout)."""
    parts = _kmeans_ctes(k, iterations, d)
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "ch_d AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    CAST(sum((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN cent{iterations} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl),\n"
        "ch_p AS MATERIALIZED (\n"
        "  SELECT cl, CAST(count(*) AS BIGINT) AS n,\n"
        "    CAST(sum(d2) AS BIGINT) AS w\n"
        "  FROM ch_d WHERE rn = 1 GROUP BY cl),\n"
        "ch_g AS MATERIALIZED (\n"
        "  SELECT pos, CAST(sum(qv) // count(*) AS BIGINT) AS gv\n"
        "  FROM qe GROUP BY pos),\n"
        "ch_b AS MATERIALIZED (\n"
        "  SELECT p.cl, p.n, p.w, p.n * s.b2 AS b\n"
        "  FROM ch_p p JOIN (\n"
        f"    SELECT c.cl,\n"
        "      CAST(sum((c.cv - g.gv) * (c.cv - g.gv)) AS BIGINT) AS b2\n"
        f"    FROM cent{iterations} c JOIN ch_g g ON g.pos = c.pos\n"
        "    GROUP BY c.cl) s ON s.cl = p.cl),\n"
        "ch_t AS (SELECT CAST(count(*) AS BIGINT) AS keff,\n"
        "  CAST(sum(n) AS BIGINT) AS n_tot,\n"
        "  CAST(sum(b) AS BIGINT) AS ssb,\n"
        "  CAST(sum(w) AS BIGINT) AS ssw FROM ch_b)\n"
        "SELECT keff AS k_clusters, n_tot AS n_vectors, ssb, ssw,\n"
        "  CAST(CASE WHEN keff >= 2 AND n_tot > keff AND ssw > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * ssb * (n_tot - keff))\n"
        "    // (CAST(ssw AS HUGEINT) * (keff - 1))\n"
        "  END AS BIGINT) AS ch_micros\n"
        "FROM ch_t"
    )


def cvm_2sample_sql(
    type_a: str = "purchase", type_b: str = "click",
    value_col: str = "value",
) -> str:
    """Mirror of operators.analytics.cvm_2sample: pooled distinct-cents
    alphabet, cumulative per-group counts, Σ c·D² on HUGEINT, one
    truncating micros division (nonnegative numerator)."""
    return (
        "WITH cv_s AS MATERIALIZED (\n"
        f"  SELECT CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END"
        " AS is_a,\n"
        f"    CAST(round({value_col} * 100) AS BIGINT) AS v\n"
        f"  FROM events WHERE event_type IN ('{type_a}', '{type_b}')),\n"
        "cv_p AS MATERIALIZED (\n"
        "  SELECT v, CAST(count(*) AS BIGINT) AS cnt,\n"
        "    CAST(sum(is_a) AS BIGINT) AS cnt_a\n"
        "  FROM cv_s GROUP BY v),\n"
        "cv_t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,\n"
        "  CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b FROM cv_p),\n"
        "cv_c AS MATERIALIZED (\n"
        "  SELECT cnt,\n"
        "    sum(cnt_a) OVER wc AS ca,\n"
        "    sum(cnt) OVER wc - sum(cnt_a) OVER wc AS cb\n"
        "  FROM cv_p WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW)),\n"
        "cv_a AS (SELECT\n"
        "  (SELECT n_a FROM cv_t) AS n_a,\n"
        "  (SELECT n_b FROM cv_t) AS n_b,\n"
        "  sum(CAST(cnt AS HUGEINT)\n"
        "    * (ca * (SELECT n_b FROM cv_t) - cb * (SELECT n_a FROM cv_t))\n"
        "    * (ca * (SELECT n_b FROM cv_t) - cb * (SELECT n_a FROM cv_t)))"
        " AS tsum\n"
        "  FROM cv_c)\n"
        "SELECT n_a, n_b,\n"
        "  CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * tsum)\n"
        "    // CAST(n_a * n_b * (n_a + n_b) * (n_a + n_b) AS HUGEINT)\n"
        "  END AS BIGINT) AS t_micros\n"
        "FROM cv_a"
    )


def cronbach_alpha_sql(
    type_col: str = "event_type", user_col: str = "user_id"
) -> str:
    """Mirror of operators.analytics.cronbach_alpha: per-(user, type)
    counts, the n²-cancelling population-variance integer forms, the
    truncating micros division on HUGEINT (negative alpha truncates
    toward zero on both engines)."""
    return (
        "WITH cr_x AS MATERIALIZED (\n"
        f"  SELECT {user_col} AS u, {type_col} AS t,\n"
        "    CAST(count(*) AS BIGINT) AS x\n"
        "  FROM events GROUP BY 1, 2),\n"
        "cr_i AS (SELECT CAST(count(*) AS BIGINT) AS k,\n"
        "  CAST(sum(q) AS BIGINT) AS qsum,"
        " CAST(sum(s * s) AS BIGINT) AS ssq FROM (\n"
        "    SELECT t, CAST(sum(x) AS BIGINT) AS s,\n"
        "      CAST(sum(x * x) AS BIGINT) AS q FROM cr_x GROUP BY t)),\n"
        "cr_u AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(tu) AS BIGINT) AS st,"
        " CAST(sum(tu * tu) AS BIGINT) AS qt FROM (\n"
        "    SELECT u, CAST(sum(x) AS BIGINT) AS tu"
        " FROM cr_x GROUP BY u))\n"
        "SELECT n AS n_users, k AS k_types,\n"
        "  CAST(n * qsum - ssq AS BIGINT) AS item_var_num,\n"
        "  CAST(n * qt - st * st AS BIGINT) AS total_var_num,\n"
        "  CAST(CASE WHEN k >= 2 AND n * qt - st * st > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * k\n"
        "     * ((n * qt - st * st) - (n * qsum - ssq)))\n"
        "    // CAST((k - 1) * (n * qt - st * st) AS HUGEINT)\n"
        "  END AS BIGINT) AS alpha_micros\n"
        "FROM cr_u, cr_i"
    )


def kmeans_label_ari_sql(
    k: int = 4, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.kmeans_label_ari: the shared
    unrolled-Lloyd CTEs, (d2, cl)-rule assignment joined to the label
    column, pair-count contingency algebra, HUGEINT truncating micros
    division (negative ARI truncates toward zero on both engines)."""
    parts = _kmeans_ctes(k, iterations, d)
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "ar_d AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN cent{iterations} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl),\n"
        "ar_ct AS MATERIALIZED (\n"
        "  SELECT a.cl, e.label AS lab, CAST(count(*) AS BIGINT) AS c\n"
        "  FROM (SELECT vec_id, cl FROM ar_d WHERE rn = 1) a\n"
        "  JOIN embeddings e ON e.vec_id = a.vec_id\n"
        "  GROUP BY 1, 2),\n"
        "ar_s AS (SELECT CAST(sum(c) AS BIGINT) AS n,\n"
        "  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS idx,\n"
        "  CAST(count(DISTINCT cl) AS BIGINT) AS kc,\n"
        "  CAST(count(DISTINCT lab) AS BIGINT) AS nl FROM ar_ct),\n"
        "ar_a AS (SELECT CAST(sum((a * (a - 1)) // 2) AS BIGINT) AS pa\n"
        "  FROM (SELECT cl, CAST(sum(c) AS BIGINT) AS a FROM ar_ct"
        " GROUP BY cl)),\n"
        "ar_b AS (SELECT CAST(sum((b * (b - 1)) // 2) AS BIGINT) AS pb\n"
        "  FROM (SELECT lab, CAST(sum(c) AS BIGINT) AS b FROM ar_ct"
        " GROUP BY lab))\n"
        "SELECT n AS n_vectors, kc AS k_clusters, nl AS n_labels,\n"
        "  idx AS index_pairs,\n"
        "  CAST(CASE WHEN ((n * (n - 1)) // 2) * (pa + pb)"
        " - 2 * pa * pb <> 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * 2\n"
        "     * (((n * (n - 1)) // 2) * idx - pa * pb))\n"
        "    // CAST(((n * (n - 1)) // 2) * (pa + pb) - 2 * pa * pb"
        " AS HUGEINT)\n"
        "  END AS BIGINT) AS ari_micros\n"
        "FROM ar_s, ar_a, ar_b"
    )


def ann_hamming_recall_sql(
    k: int = 5, d: int = 64, num_queries: int = 20
) -> str:
    """Mirror of operators.similarity.hamming_recall: packed 32-bit
    sign-bit words, popcount-of-XOR Hamming ranking vs the brute-force
    cosine truth, integer hit counts."""
    words = []
    for w in range((d + 31) // 32):
        bits = " + ".join(
            f"(CASE WHEN embedding[{w * 32 + j + 1}] >= 0"
            f" THEN {1 << j} ELSE 0 END)"
            for j in range(32)
            if w * 32 + j < d
        )
        words.append(f"CAST({bits} AS BIGINT) AS w{w}")
    ham = " + ".join(
        f"bit_count(xor(q.w{w}, c.w{w}))" for w in range((d + 31) // 32)
    )
    return (
        "WITH eb AS MATERIALIZED (SELECT vec_id,\n"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,\n"
        f"  {', '.join(words)} FROM embeddings),\n"
        f"q AS MATERIALIZED (SELECT * FROM eb WHERE vec_id < {num_queries}),\n"
        "truth AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        f"    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        "        ORDER BY "
        f"{_COS} DESC, c.vec_id ASC) AS rank\n"
        "    FROM q JOIN eb c ON c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "approx AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id FROM (\n"
        f"    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,\n"
        f"      row_number() OVER (PARTITION BY q.vec_id\n"
        f"        ORDER BY {ham} ASC, c.vec_id ASC) AS rank\n"
        "    FROM q JOIN eb c ON c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "nt AS (SELECT query_id, count(*) AS n_truth FROM truth"
        " GROUP BY query_id),\n"
        "na AS (SELECT query_id, count(*) AS n_approx FROM approx"
        " GROUP BY query_id),\n"
        "h AS (SELECT t.query_id, count(*) AS n_hits\n"
        "  FROM truth t JOIN approx a\n"
        "    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id\n"
        "  GROUP BY t.query_id)\n"
        "SELECT nt.query_id, CAST(nt.n_truth AS BIGINT) AS n_truth,\n"
        "  CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,\n"
        "  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,\n"
        "  round(COALESCE(h.n_hits, 0) / nt.n_truth, 6) AS recall\n"
        "FROM nt LEFT JOIN na ON na.query_id = nt.query_id\n"
        "LEFT JOIN h ON h.query_id = nt.query_id"
    )


def seasonal_decompose_daily_sql(period: int = 7) -> str:
    """Mirror of operators.analytics.seasonal_decompose_daily:
    zero-filled spine, centered moving-average trend (NULL on
    incomplete windows), per-weekday truncating detrended means,
    residuals — truncation toward zero on both engines."""
    half = period // 2
    return (
        "WITH sd_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "sd_r AS (SELECT min(d) AS lo, max(d) AS hi FROM sd_d),\n"
        "sd_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM sd_r) sp\n"
        "  LEFT JOIN sd_d dl USING (d)),\n"
        "sd_t AS MATERIALIZED (\n"
        "  SELECT d, y,\n"
        "    CAST(CASE WHEN count(*) OVER ww = "
        f"{period} THEN\n"
        "      (1000000 * sum(y) OVER ww) // "
        f"{period} END AS BIGINT) AS trend_micros,\n"
        f"    CAST((d + 3) % {period} AS INT) AS dow\n"
        "  FROM sd_f WINDOW ww AS (ORDER BY d ROWS BETWEEN "
        f"{half} PRECEDING AND {half} FOLLOWING)),\n"
        "sd_x AS MATERIALIZED (\n"
        "  SELECT d, y, trend_micros, dow,\n"
        "    CAST(1000000 * y - trend_micros AS BIGINT) AS det\n"
        "  FROM sd_t),\n"
        "sd_s AS MATERIALIZED (\n"
        "  SELECT dow, CAST(CASE WHEN sum(det) >= 0\n"
        "      THEN sum(det) // count(*)\n"
        "      ELSE -((-sum(det)) // count(*)) END AS BIGINT)"
        " AS seasonal_micros\n"
        "  FROM sd_x WHERE det IS NOT NULL GROUP BY dow)\n"
        "SELECT x.d, x.y, x.trend_micros, s.seasonal_micros,\n"
        "  CAST(x.det - s.seasonal_micros AS BIGINT) AS resid_micros\n"
        "FROM sd_x x LEFT JOIN sd_s s ON s.dow = x.dow"
    )


def pacf_daily_sql() -> str:
    """Mirror of operators.analytics.pacf_daily: the acf_daily
    n-scaled integer deviations, lag-1/lag-2 moment sums, and the two
    Durbin–Levinson micros divisions on HUGEINT (truncating toward
    zero, negatives included)."""
    return (
        "WITH pf_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "pf_r AS (SELECT min(d) AS lo, max(d) AS hi,\n"
        "  CAST(sum(y) AS BIGINT) AS s,\n"
        "  CAST(max(d) - min(d) + 1 AS BIGINT) AS n FROM pf_d),\n"
        "pf_v AS MATERIALIZED (\n"
        "  SELECT sp.d,\n"
        "    CAST((SELECT n FROM pf_r) * COALESCE(dl.y, 0)\n"
        "      - (SELECT s FROM pf_r) AS BIGINT) AS dev\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM pf_r) sp\n"
        "  LEFT JOIN pf_d dl USING (d)),\n"
        "pf_m AS (SELECT (SELECT n FROM pf_r) AS n_days,\n"
        "  CAST(sum(a.dev * a.dev) AS BIGINT) AS c0,\n"
        "  CAST(sum(a.dev * b1.dev) AS BIGINT) AS c1,\n"
        "  CAST(sum(a.dev * b2.dev) AS BIGINT) AS c2\n"
        "  FROM pf_v a\n"
        "  LEFT JOIN pf_v b1 ON b1.d = a.d - 1\n"
        "  LEFT JOIN pf_v b2 ON b2.d = a.d - 2)\n"
        "SELECT n_days, c0, c1, c2,\n"
        "  CAST(CASE WHEN c0 > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * c1) // CAST(c0 AS HUGEINT)\n"
        "  END AS BIGINT) AS pacf1_micros,\n"
        "  CAST(CASE WHEN CAST(c0 AS HUGEINT) * c0"
        " - CAST(c1 AS HUGEINT) * c1 > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT)\n"
        "     * (CAST(c2 AS HUGEINT) * c0 - CAST(c1 AS HUGEINT) * c1))\n"
        "    // (CAST(c0 AS HUGEINT) * c0 - CAST(c1 AS HUGEINT) * c1)\n"
        "  END AS BIGINT) AS pacf2_micros\n"
        "FROM pf_m"
    )


def core_periphery_sql(k: int = 2, max_rounds: int = 64) -> str:
    """Mirror of algos.components.core_periphery_blocks: the kcore_sql
    unrolled peel, membership-tagged u<v undirected edges, block
    counts and truncating micros densities (all nonnegative)."""
    parts = ["kc0 AS MATERIALIZED (SELECT id FROM vertices)"]
    for r in range(1, max_rounds + 1):
        prev = f"kc{r - 1}"
        parts.append(
            f"kc{r} AS MATERIALIZED (\n"
            f"  SELECT v.id FROM {prev} v JOIN (\n"
            f"    SELECT u.src, count(*) AS c FROM und u\n"
            f"    JOIN {prev} x ON x.id = u.src\n"
            f"    JOIN {prev} y ON y.id = u.dst\n"
            f"    GROUP BY u.src) d ON d.src = v.id AND d.c >= {k})"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined},\n"
        "cp_m AS MATERIALIZED (\n"
        "  SELECT v.id, CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END"
        " AS c\n"
        f"  FROM vertices v LEFT JOIN kc{max_rounds} c ON c.id = v.id),\n"
        "cp_e AS (SELECT\n"
        "  CAST(COALESCE(sum(CASE WHEN a.c + b.c = 2 THEN 1 ELSE 0 END),"
        " 0) AS BIGINT) AS e_cc,\n"
        "  CAST(COALESCE(sum(CASE WHEN a.c + b.c = 1 THEN 1 ELSE 0 END),"
        " 0) AS BIGINT) AS e_cp,\n"
        "  CAST(COALESCE(sum(CASE WHEN a.c + b.c = 0 THEN 1 ELSE 0 END),"
        " 0) AS BIGINT) AS e_pp\n"
        "  FROM (SELECT src, dst FROM und WHERE src < dst) e\n"
        "  JOIN cp_m a ON a.id = e.src JOIN cp_m b ON b.id = e.dst),\n"
        "cp_n AS (SELECT CAST(sum(c) AS BIGINT) AS n_core,\n"
        "  CAST(sum(1 - c) AS BIGINT) AS n_periphery FROM cp_m)\n"
        "SELECT n_core, n_periphery, e_cc, e_cp, e_pp,\n"
        "  CAST(CASE WHEN n_core >= 2 THEN (1000000 * e_cc)\n"
        "    // ((n_core * (n_core - 1)) // 2) END AS BIGINT)"
        " AS dens_cc_micros,\n"
        "  CAST(CASE WHEN n_core > 0 AND n_periphery > 0 THEN\n"
        "    (1000000 * e_cp) // (n_core * n_periphery) END AS BIGINT)"
        " AS dens_cp_micros,\n"
        "  CAST(CASE WHEN n_periphery >= 2 THEN (1000000 * e_pp)\n"
        "    // ((n_periphery * (n_periphery - 1)) // 2) END AS BIGINT)"
        " AS dens_pp_micros\n"
        "FROM cp_n, cp_e"
    )
    return _graph_query(body)


def granger_daily_sql(
    type_a: str = "purchase", type_b: str = "click"
) -> str:
    """Mirror of operators.analytics.granger_daily: shared-spine lagged
    pairs, m-scaled centered BIGINT moments, and the closed-form F
    whose numerator is the squared partial covariance — HUGEINT
    truncating micros division."""
    return (
        "WITH gr_c AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        f"    CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END AS g,\n"
        "    CAST(count(*) AS BIGINT) AS c\n"
        f"  FROM events WHERE event_type IN ('{type_a}', '{type_b}')\n"
        "  GROUP BY 1, 2),\n"
        "gr_r AS (SELECT min(d) AS lo, max(d) AS hi FROM gr_c),\n"
        "gr_f AS MATERIALIZED (\n"
        "  SELECT sp.d,\n"
        "    CAST(COALESCE(a.c, 0) AS BIGINT) AS ya,\n"
        "    CAST(COALESCE(b.c, 0) AS BIGINT) AS yb\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM gr_r) sp\n"
        "  LEFT JOIN (SELECT d, c FROM gr_c WHERE g = 1) a USING (d)\n"
        "  LEFT JOIN (SELECT d, c FROM gr_c WHERE g = 0) b USING (d)),\n"
        "gr_p AS MATERIALIZED (\n"
        "  SELECT t.ya AS y, p.ya AS u, p.yb AS v\n"
        "  FROM gr_f t JOIN gr_f p ON p.d = t.d - 1),\n"
        "gr_m AS (SELECT CAST(count(*) AS BIGINT) AS m,\n"
        "  CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,\n"
        "  CAST(sum(y) AS BIGINT) AS sy,\n"
        "  CAST(sum(u * u) AS BIGINT) AS puu,"
        " CAST(sum(v * v) AS BIGINT) AS pvv,\n"
        "  CAST(sum(u * v) AS BIGINT) AS puv,"
        " CAST(sum(u * y) AS BIGINT) AS puy,\n"
        "  CAST(sum(v * y) AS BIGINT) AS pvy,"
        " CAST(sum(y * y) AS BIGINT) AS pyy FROM gr_p),\n"
        "gr_s AS (SELECT m,\n"
        "  CAST(m * puu - su * su AS BIGINT) AS suu,\n"
        "  CAST(m * pvv - sv * sv AS BIGINT) AS svv,\n"
        "  CAST(m * puv - su * sv AS BIGINT) AS suv,\n"
        "  CAST(m * puy - su * sy AS BIGINT) AS suy,\n"
        "  CAST(m * pvy - sv * sy AS BIGINT) AS svy,\n"
        "  CAST(m * pyy - sy * sy AS BIGINT) AS syy FROM gr_m),\n"
        "gr_b AS (SELECT m, suu, suy, svy, syy,\n"
        "  CAST(suu AS HUGEINT) * svv - CAST(suv AS HUGEINT) * suv"
        " AS dd,\n"
        "  CAST(suu AS HUGEINT) * svy - CAST(suy AS HUGEINT) * suv"
        " AS aa,\n"
        "  CAST(suy AS HUGEINT) * suy * svv\n"
        "    - 2 * (CAST(suy AS HUGEINT) * suv * svy)\n"
        "    + CAST(svy AS HUGEINT) * svy * suu AS qq\n"
        "  FROM gr_s)\n"
        "SELECT m AS n_pairs, suu, suy, svy,\n"
        "  CAST(CASE WHEN m > 3\n"
        "      AND (CAST(syy AS HUGEINT) * dd - qq) * suu > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * (m - 3) * aa * aa)\n"
        "    // ((CAST(syy AS HUGEINT) * dd - qq) * suu)\n"
        "  END AS BIGINT) AS f_micros\n"
        "FROM gr_b"
    )


def cochran_q_sql(
    type_col: str = "event_type", user_col: str = "user_id"
) -> str:
    """Mirror of operators.analytics.cochran_q: distinct (user, type)
    incidence, per-type and per-user totals, the all-integer Q with a
    truncating HUGEINT micros division."""
    return (
        "WITH cq_i AS MATERIALIZED (\n"
        f"  SELECT DISTINCT {user_col} AS u, {type_col} AS t"
        " FROM events),\n"
        "cq_c AS (SELECT CAST(count(*) AS BIGINT) AS k,\n"
        "  CAST(sum(s) AS BIGINT) AS tt,"
        " CAST(sum(s * s) AS BIGINT) AS ssq FROM (\n"
        "    SELECT t, CAST(count(*) AS BIGINT) AS s FROM cq_i"
        " GROUP BY t)),\n"
        "cq_r AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(r * r) AS BIGINT) AS rsq FROM (\n"
        "    SELECT u, CAST(count(*) AS BIGINT) AS r FROM cq_i"
        " GROUP BY u))\n"
        "SELECT n AS n_users, k AS k_types, ssq AS col_sq_sum,\n"
        "  rsq AS row_sq_sum,\n"
        "  CAST(CASE WHEN k >= 2 AND k * tt - rsq > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * (k - 1) * (k * ssq - tt * tt))\n"
        "    // CAST(k * tt - rsq AS HUGEINT)\n"
        "  END AS BIGINT) AS q_micros\n"
        "FROM cq_r, cq_c"
    )


def durbin_watson_daily_sql() -> str:
    """Mirror of operators.analytics.durbin_watson_daily: zero-filled
    spine, denominator-cleared BIGINT OLS residuals, HUGEINT squared
    sums, one truncating micros division."""
    return (
        "WITH dw_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "dw_r AS (SELECT min(d) AS lo, max(d) AS hi FROM dw_d),\n"
        "dw_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(sp.d - (SELECT lo FROM dw_r) AS BIGINT)"
        " AS x,\n"
        "    CAST(COALESCE(dl.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM dw_r) sp\n"
        "  LEFT JOIN dw_d dl USING (d)),\n"
        "dw_m AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,\n"
        "  CAST(sum(x * y) AS BIGINT) AS sxy,"
        " CAST(sum(x * x) AS BIGINT) AS sxx FROM dw_f),\n"
        "dw_e AS MATERIALIZED (\n"
        "  SELECT f.d, m.n,\n"
        "    CAST((m.n * m.sxx - m.sx * m.sx) * (m.n * f.y - m.sy)\n"
        "      - (m.n * m.sxy - m.sx * m.sy) * (m.n * f.x - m.sx)"
        " AS BIGINT) AS et\n"
        "  FROM dw_f f, dw_m m),\n"
        "dw_l AS MATERIALIZED (\n"
        "  SELECT n, et, lag(et) OVER (ORDER BY d) AS ep FROM dw_e),\n"
        "dw_a AS (SELECT max(n) AS n_days,\n"
        "  sum(CAST(et AS HUGEINT) * et) AS se,\n"
        "  sum(CAST(et - ep AS HUGEINT) * (et - ep)) AS sd FROM dw_l)\n"
        "SELECT CAST(n_days AS BIGINT) AS n_days,\n"
        "  CAST(CASE WHEN se > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * sd) // se\n"
        "  END AS BIGINT) AS dw_micros\n"
        "FROM dw_a"
    )


def kmeans_label_nmi_sql(
    k: int = 4, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.kmeans_label_nmi: the shared
    unrolled-Lloyd CTEs and contingency, per-term micro-rounded MI and
    entropy expressions (identical float shape), exact micro sums,
    one truncating integer division."""
    parts = _kmeans_ctes(k, iterations, d)
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "nm_d AS MATERIALIZED (\n"
        "  SELECT q.vec_id, c.cl,\n"
        "    row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
        "      sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
        f"  FROM qe q JOIN cent{iterations} c ON c.pos = q.pos\n"
        "  GROUP BY q.vec_id, c.cl),\n"
        "nm_ct AS MATERIALIZED (\n"
        "  SELECT a.cl, e.label AS lab, CAST(count(*) AS BIGINT) AS c\n"
        "  FROM (SELECT vec_id, cl FROM nm_d WHERE rn = 1) a\n"
        "  JOIN embeddings e ON e.vec_id = a.vec_id\n"
        "  GROUP BY 1, 2),\n"
        "nm_n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM nm_ct),\n"
        "nm_a AS MATERIALIZED (SELECT cl, CAST(sum(c) AS BIGINT) AS a\n"
        "  FROM nm_ct GROUP BY cl),\n"
        "nm_b AS MATERIALIZED (SELECT lab, CAST(sum(c) AS BIGINT) AS b\n"
        "  FROM nm_ct GROUP BY lab),\n"
        "nm_mi AS (SELECT CAST(sum(CAST(round(\n"
        "    (ct.c / nn.n) * ln((ct.c * nn.n) / (a.a * b.b)) * 1000000\n"
        "  ) AS BIGINT)) AS BIGINT) AS mi_micros\n"
        "  FROM nm_ct ct JOIN nm_a a ON a.cl = ct.cl\n"
        "  JOIN nm_b b ON b.lab = ct.lab, nm_n nn),\n"
        "nm_hc AS (SELECT CAST(sum(CAST(round(\n"
        "    -(a.a / nn.n) * ln(a.a / nn.n) * 1000000\n"
        "  ) AS BIGINT)) AS BIGINT) AS hc_micros FROM nm_a a, nm_n nn),\n"
        "nm_hl AS (SELECT CAST(sum(CAST(round(\n"
        "    -(b.b / nn.n) * ln(b.b / nn.n) * 1000000\n"
        "  ) AS BIGINT)) AS BIGINT) AS hl_micros FROM nm_b b, nm_n nn)\n"
        "SELECT n AS n_vectors, mi_micros, hc_micros, hl_micros,\n"
        "  CAST(CASE WHEN hc_micros + hl_micros > 0 THEN\n"
        "    (1000000 * 2 * mi_micros) // (hc_micros + hl_micros)\n"
        "  END AS BIGINT) AS nmi_micros\n"
        "FROM nm_n, nm_mi, nm_hc, nm_hl"
    )


def theils_u_type_dow_sql() -> str:
    """Mirror of operators.analytics.theils_u over (epoch dow, type):
    identical per-term micro-rounded MI and entropy expressions, exact
    micro sums, one truncating integer division."""
    return (
        "WITH tu_j AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS x,\n"
        "    event_type AS y, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM events GROUP BY 1, 2),\n"
        "tu_x AS MATERIALIZED (SELECT x, CAST(SUM(n) AS BIGINT) AS nx"
        " FROM tu_j GROUP BY x),\n"
        "tu_y AS MATERIALIZED (SELECT y, CAST(SUM(n) AS BIGINT) AS ny"
        " FROM tu_j GROUP BY y),\n"
        "tu_n AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM tu_j),\n"
        "tu_mi AS (SELECT CAST(sum(CAST(round(\n"
        "    1000000.0 * j.n * ln((j.n * t.nn) / (x.nx * y.ny)) / t.nn,"
        " 0) AS BIGINT)) AS BIGINT) AS mi_micros\n"
        "  FROM tu_j j JOIN tu_x x USING (x) JOIN tu_y y USING (y),"
        " tu_n t),\n"
        "tu_hy AS (SELECT CAST(sum(CAST(round(\n"
        "    -(y.ny / t.nn) * ln(y.ny / t.nn) * 1000000\n"
        "  ) AS BIGINT)) AS BIGINT) AS hy_micros FROM tu_y y, tu_n t)\n"
        "SELECT nn AS n, mi_micros, hy_micros,\n"
        "  CAST(CASE WHEN hy_micros > 0 THEN\n"
        "    (1000000 * mi_micros) // hy_micros END AS BIGINT)"
        " AS u_micros\n"
        "FROM tu_n, tu_mi, tu_hy"
    )


def user_surprisal_sql(
    type_col: str = "event_type", user_col: str = "user_id"
) -> str:
    """Mirror of operators.analytics.user_surprisal: per-type
    micro-rounded −ln p terms computed once, exact per-user integer
    dot products, truncating mean."""
    return (
        "WITH us_c AS MATERIALIZED (\n"
        f"  SELECT {user_col} AS u, {type_col} AS t,\n"
        "    CAST(count(*) AS BIGINT) AS c\n"
        "  FROM events GROUP BY 1, 2),\n"
        "us_t AS MATERIALIZED (SELECT t, CAST(sum(c) AS BIGINT) AS ct\n"
        "  FROM us_c GROUP BY t),\n"
        "us_n AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM us_t),\n"
        "us_k AS MATERIALIZED (SELECT t,\n"
        "  CAST(round(-ln(ct / nn) * 1000000) AS BIGINT) AS term\n"
        "  FROM us_t, us_n)\n"
        f"SELECT c.u AS {user_col},\n"
        "  CAST(sum(c.c) AS BIGINT) AS n_events,\n"
        "  CAST(CAST(sum(c.c * k.term) AS BIGINT) // sum(c.c)"
        " AS BIGINT) AS surprisal_micros\n"
        "FROM us_c c JOIN us_k k USING (t) GROUP BY c.u"
    )


def burrows_delta_sql(top_n: int = 20) -> str:
    """Mirror of operators.tfidf.burrows_delta: same tokenization,
    (count DESC, word ASC) panel, truncating micros frequencies,
    denominator-cleared z with one identically-shaped sqrt rounding,
    exact integer Delta mean."""
    return (
        "WITH bd_t AS MATERIALIZED (\n"
        "  SELECT source AS s, w, CAST(count(*) AS BIGINT) AS c\n"
        "  FROM (SELECT source, unnest(list_filter(\n"
        "    string_split_regex(lower(text), '\\s+'), x -> x <> ''))"
        " AS w\n"
        "  FROM documents) GROUP BY 1, 2),\n"
        "bd_s AS MATERIALIZED (SELECT s, CAST(sum(c) AS BIGINT) AS tot\n"
        "  FROM bd_t GROUP BY s),\n"
        "bd_p AS MATERIALIZED (SELECT w FROM (\n"
        "  SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM bd_t GROUP BY w)\n"
        f"  ORDER BY cw DESC, w ASC LIMIT {top_n}),\n"
        "bd_l AS MATERIALIZED (\n"
        "  SELECT t.s, p.w,\n"
        "    CAST((1000000 * COALESCE(c.c, 0)) // t.tot AS BIGINT)"
        " AS f\n"
        "  FROM bd_s t CROSS JOIN bd_p p\n"
        "  LEFT JOIN bd_t c ON c.s = t.s AND c.w = p.w),\n"
        "bd_m AS MATERIALIZED (SELECT w,\n"
        "  CAST(count(*) AS BIGINT) AS k, CAST(sum(f) AS BIGINT) AS sw,\n"
        "  CAST(sum(f * f) AS BIGINT) AS qw FROM bd_l GROUP BY w),\n"
        "bd_z AS MATERIALIZED (\n"
        "  SELECT l.s, l.w,\n"
        "    CAST(CASE WHEN m.k * m.qw - m.sw * m.sw > 0 THEN\n"
        "      round((m.k * l.f - m.sw)\n"
        "        / sqrt(m.k * m.qw - m.sw * m.sw) * 1000000)\n"
        "    ELSE 0 END AS BIGINT) AS z\n"
        "  FROM bd_l l JOIN bd_m m USING (w))\n"
        "SELECT a.s AS source_a, b.s AS source_b,\n"
        "  CAST(count(*) AS BIGINT) AS n_words,\n"
        "  CAST(CAST(sum(abs(a.z - b.z)) AS BIGINT) // count(*)"
        " AS BIGINT) AS delta_micros\n"
        "FROM bd_z a JOIN bd_z b ON b.w = a.w AND a.s < b.s\n"
        "GROUP BY 1, 2"
    )


def jonckheere_trend_sql(value_col: str = "value") -> str:
    """Mirror of operators.analytics.jonckheere_trend: (dow, cents)
    counts, per-group cumulative-below on the shared alphabet
    lattice, doubled pairwise Mann–Whitney sums, the exact null
    expectation — all BIGINT."""
    return (
        "WITH jt_s AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS g,\n"
        f"    CAST(round({value_col} * 100) AS BIGINT) AS v\n"
        "  FROM events),\n"
        "jt_c AS MATERIALIZED (SELECT g, v,"
        " CAST(count(*) AS BIGINT) AS c\n"
        "  FROM jt_s GROUP BY 1, 2),\n"
        "jt_l AS MATERIALIZED (\n"
        "  SELECT gr.g, al.v, CAST(COALESCE(c.c, 0) AS BIGINT) AS ci\n"
        "  FROM (SELECT DISTINCT v FROM jt_c) al\n"
        "  CROSS JOIN (SELECT DISTINCT g FROM jt_c) gr\n"
        "  LEFT JOIN jt_c c ON c.g = gr.g AND c.v = al.v),\n"
        "jt_i AS MATERIALIZED (\n"
        "  SELECT g AS gi, v, ci,\n"
        "    CAST(COALESCE(sum(ci) OVER (PARTITION BY g ORDER BY v\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS below\n"
        "  FROM jt_l),\n"
        "jt_2 AS (SELECT CAST(COALESCE(sum(\n"
        "    2 * j.c * i.below + j.c * i.ci), 0) AS BIGINT) AS jt2\n"
        "  FROM jt_c j JOIN jt_i i ON i.v = j.v AND i.gi < j.g),\n"
        "jt_t AS (SELECT CAST(count(*) AS BIGINT) AS k,\n"
        "  CAST(sum(n) AS BIGINT) AS nn,"
        " CAST(sum(n * n) AS BIGINT) AS nsq FROM (\n"
        "    SELECT g, CAST(sum(c) AS BIGINT) AS n FROM jt_c"
        " GROUP BY g))\n"
        "SELECT nn AS n_total, k AS k_groups, jt2,\n"
        "  CAST((nn * nn - nsq) // 2 AS BIGINT) AS e2_null\n"
        "FROM jt_t, jt_2"
    )


def ann_mrr_sql(
    k: int = 10, num_queries: int = 20
) -> str:
    """Mirror of operators.similarity.ann_mrr: brute-force cosine
    top-k, first same-label rank, truncating reciprocal-rank micros,
    truncating mean."""
    return (
        "WITH eb AS MATERIALIZED (SELECT vec_id, label,\n"
        "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings),\n"
        f"q AS MATERIALIZED (SELECT * FROM eb WHERE vec_id < {num_queries}),\n"
        "topk AS MATERIALIZED (\n"
        "  SELECT query_id, neighbor_id, rank FROM (\n"
        f"    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,\n"
        "      row_number() OVER (PARTITION BY q.vec_id\n"
        "        ORDER BY "
        f"{_COS} DESC, c.vec_id ASC) AS rank\n"
        "    FROM q JOIN eb c ON c.vec_id <> q.vec_id)\n"
        f"  WHERE rank <= {k}),\n"
        "fr AS MATERIALIZED (\n"
        "  SELECT t.query_id, CAST(min(t.rank) AS BIGINT) AS first_rank\n"
        "  FROM topk t JOIN eb n ON n.vec_id = t.neighbor_id\n"
        "  JOIN q ON q.vec_id = t.query_id\n"
        "  WHERE q.label = n.label GROUP BY t.query_id),\n"
        "per AS (SELECT COALESCE(1000000 // f.first_rank, 0) AS rr\n"
        "  FROM q LEFT JOIN fr f ON f.query_id = q.vec_id)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_queries,\n"
        "  CAST(sum(CASE WHEN rr > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_hit,\n"
        "  CAST(CAST(sum(rr) AS BIGINT) // count(*) AS BIGINT)"
        " AS mrr_micros\n"
        "FROM per"
    )


def kruskal_wallis_sql(
    group_col: str = "event_type", value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.kruskal_wallis: global doubled
    midranks on the cents alphabet, tie-corrected deviation
    denominator, per-group truncating micros terms (successive //
    equals the product division for nonnegative integers), exact
    sum."""
    return (
        "WITH kw_s AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,"
        f" CAST(round({value_col} * 100) AS BIGINT) AS v FROM events),\n"
        "kw_v AS MATERIALIZED (SELECT v,"
        " CAST(count(*) AS BIGINT) AS ct FROM kw_s GROUP BY v),\n"
        "kw_r AS MATERIALIZED (\n"
        "  SELECT v, ct, CAST(2 * COALESCE(sum(ct) OVER (ORDER BY v\n"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)\n"
        "    + ct + 1 AS BIGINT) AS r2 FROM kw_v),\n"
        "kw_n AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM kw_v),\n"
        "kw_d AS (SELECT CAST(sum(ct * (r2 - (nn.n + 1))"
        " * (r2 - (nn.n + 1))) AS BIGINT) AS d\n"
        "  FROM kw_r, kw_n nn),\n"
        "kw_g AS MATERIALIZED (\n"
        "  SELECT s.g, CAST(count(*) AS BIGINT) AS nj,\n"
        "    CAST(sum(r.r2) AS BIGINT) AS r2j\n"
        "  FROM kw_s s JOIN kw_r r ON r.v = s.v GROUP BY s.g),\n"
        "kw_t AS (SELECT g, nj,\n"
        "  CASE WHEN dd.d > 0 THEN\n"
        "    CAST((CAST(1000000 AS HUGEINT) * (nn.n - 1)\n"
        "      * (r2j - nj * (nn.n + 1)) * (r2j - nj * (nn.n + 1)))\n"
        "      // CAST(nj AS HUGEINT) // CAST(dd.d AS HUGEINT)"
        " AS BIGINT)\n"
        "  END AS term\n"
        "  FROM kw_g, kw_n nn, kw_d dd)\n"
        "SELECT CAST(sum(nj) AS BIGINT) AS n_total,\n"
        "  CAST(count(*) AS BIGINT) AS k_groups,\n"
        "  (SELECT d FROM kw_d) AS rank_dev_den,\n"
        "  CAST(sum(term) AS BIGINT) AS h_micros\n"
        "FROM kw_t"
    )


def collective_influence_sql(
    max_wedge_degree: int = 100, top_k: int = 20
) -> str:
    """Mirror of algos.centrality.collective_influence: undirected
    degrees, capped wedge centers, distinct exact-2 frontier (2-hop
    minus direct neighbors minus self), BIGINT CI, (ci DESC, id)
    top-k."""
    body = (
        ", cid AS MATERIALIZED (SELECT src,"
        " CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY src),\n"
        "cic AS (SELECT src AS w FROM cid"
        f" WHERE deg >= 2 AND deg <= {max_wedge_degree}),\n"
        "cit AS MATERIALIZED (\n"
        "  SELECT DISTINCT e1.src AS v, e2.dst AS u\n"
        "  FROM und e1 JOIN cic c ON c.w = e1.dst\n"
        "  JOIN und e2 ON e2.src = e1.dst\n"
        "  WHERE e2.dst <> e1.src),\n"
        "cif AS MATERIALIZED (\n"
        "  SELECT t.v, t.u FROM cit t\n"
        "  WHERE NOT EXISTS (SELECT 1 FROM und x"
        " WHERE x.src = t.v AND x.dst = t.u)),\n"
        "cig AS MATERIALIZED (\n"
        "  SELECT f.v, CAST(sum(d.deg - 1) AS BIGINT) AS fsum\n"
        "  FROM cif f JOIN cid d ON d.src = f.u GROUP BY f.v)\n"
        "SELECT d.src AS id, d.deg AS degree,\n"
        "  CAST((d.deg - 1) * COALESCE(g.fsum, 0) AS BIGINT) AS ci\n"
        "FROM cid d LEFT JOIN cig g ON g.v = d.src\n"
        f"ORDER BY ci DESC, id ASC LIMIT {top_k}"
    )
    return _graph_query(body)


def time_decay_attribution_sql(
    convert_type: str = "purchase",
    half_life_days: int = 1,
    max_days: int = 20,
) -> str:
    """Mirror of operators.temporal.time_decay_attribution in row form:
    the strictly-preceding (ts, event_id) touch pairs, power-of-two
    decay weights, per-conversion truncating credit shares with the
    remainder on the most recent touch, BIGINT micro-cents."""
    hl_us = half_life_days * 86_400_000_000
    return (
        "WITH td_e AS MATERIALIZED (SELECT event_id, user_id,"
        " event_type,\n"
        "  CAST(round(value * 100) AS BIGINT) AS cents,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS u FROM events),\n"
        "td_p AS MATERIALIZED (\n"
        "  SELECT c.event_id AS cid, c.cents, t.event_type AS ch,\n"
        "    CAST(1000000 // (CAST(1 AS BIGINT) << CAST(least(\n"
        f"      (c.u - t.u) // {hl_us}, {max_days}) AS INT))"
        " AS BIGINT) AS w,\n"
        "    row_number() OVER (PARTITION BY c.event_id"
        " ORDER BY t.u, t.event_id) AS rn,\n"
        "    count(*) OVER (PARTITION BY c.event_id) AS m\n"
        "  FROM td_e c JOIN td_e t ON t.user_id = c.user_id\n"
        "    AND (t.u < c.u OR (t.u = c.u AND t.event_id < c.event_id))\n"
        f"  WHERE c.event_type = '{convert_type}'"
        f" AND t.event_type <> '{convert_type}'),\n"
        "td_c AS MATERIALIZED (\n"
        "  SELECT cid, cents, ch, rn, m,\n"
        "    CAST((1000000 * w) // sum(w) OVER (PARTITION BY cid)"
        " AS BIGINT) AS cr0\n"
        "  FROM td_p),\n"
        "td_f AS MATERIALIZED (\n"
        "  SELECT cents, ch,\n"
        "    CAST(cr0 + CASE WHEN rn = m THEN 1000000\n"
        "      - sum(cr0) OVER (PARTITION BY cid) ELSE 0 END"
        " AS BIGINT) AS credit\n"
        "  FROM td_c)\n"
        "SELECT ch AS channel, CAST(count(*) AS BIGINT) AS n_touches,\n"
        "  CAST(sum(cents * credit) AS BIGINT)"
        " AS sum_credit_microcents\n"
        "FROM td_f GROUP BY ch"
    )


def funnel_multistep_sql(
    steps: tuple = ("signup", "click", "purchase"),
) -> str:
    """Mirror of operators.temporal.funnel_multistep: chained per-user
    earliest-qualifying min-aggregates, truncating conversion
    micros."""
    a, b, c = steps
    return (
        "WITH fm_e AS MATERIALIZED (SELECT user_id AS u, event_type,\n"
        "  CAST(epoch_us(ts) AS BIGINT) AS t FROM events),\n"
        "fm_1 AS MATERIALIZED (SELECT u, min(t) AS t1 FROM fm_e\n"
        f"  WHERE event_type = '{a}' GROUP BY u),\n"
        "fm_2 AS MATERIALIZED (SELECT e.u, min(e.t) AS t2\n"
        f"  FROM fm_e e JOIN fm_1 s ON s.u = e.u\n"
        f"  WHERE e.event_type = '{b}' AND e.t > s.t1 GROUP BY e.u),\n"
        "fm_3 AS MATERIALIZED (SELECT e.u, min(e.t) AS t3\n"
        f"  FROM fm_e e JOIN fm_2 s ON s.u = e.u\n"
        f"  WHERE e.event_type = '{c}' AND e.t > s.t2 GROUP BY e.u),\n"
        "fm_n AS (SELECT\n"
        "  (SELECT CAST(count(*) AS BIGINT) FROM fm_1) AS n_step1,\n"
        "  (SELECT CAST(count(*) AS BIGINT) FROM fm_2) AS n_step2,\n"
        "  (SELECT CAST(count(*) AS BIGINT) FROM fm_3) AS n_step3)\n"
        "SELECT n_step1, n_step2, n_step3,\n"
        "  CAST(CASE WHEN n_step1 > 0 THEN (1000000 * n_step2)"
        " // n_step1 END AS BIGINT) AS conv12_micros,\n"
        "  CAST(CASE WHEN n_step2 > 0 THEN (1000000 * n_step3)"
        " // n_step2 END AS BIGINT) AS conv23_micros,\n"
        "  CAST(CASE WHEN n_step1 > 0 THEN (1000000 * n_step3)"
        " // n_step1 END AS BIGINT) AS conv13_micros\n"
        "FROM fm_n"
    )


def conversion_window_curve_sql(
    from_type: str = "click",
    to_type: str = "purchase",
    windows_days: tuple = (1, 3, 7, 14),
) -> str:
    """Mirror of operators.temporal.conversion_window_curve: one
    first-conversion delay table thresholded per literal window,
    truncating micros ratios."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {int(w)} AS window_days,"
        " (SELECT n_from FROM cw_n) AS n_from,\n"
        "  CAST((SELECT COALESCE(sum(CASE WHEN d <="
        f" {int(w) * 86_400_000_000} THEN 1 ELSE 0 END), 0)"
        " FROM cw_d) AS BIGINT) AS n_converted"
        for w in windows_days
    )
    return (
        "WITH cw_f AS MATERIALIZED (\n"
        "  SELECT user_id AS u, event_id AS fid,\n"
        "    CAST(epoch_us(ts) AS BIGINT) AS ft FROM events\n"
        f"  WHERE event_type = '{from_type}'),\n"
        "cw_t AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS tt\n"
        f"  FROM events WHERE event_type = '{to_type}'),\n"
        "cw_d AS MATERIALIZED (\n"
        "  SELECT f.fid, CAST(min(t.tt - f.ft) AS BIGINT) AS d\n"
        "  FROM cw_f f JOIN cw_t t ON t.u = f.u AND t.tt > f.ft\n"
        "  GROUP BY f.fid),\n"
        "cw_n AS (SELECT CAST(count(*) AS BIGINT) AS n_from"
        " FROM cw_f),\n"
        f"cw_w AS ({rows})\n"
        "SELECT CAST(window_days AS INT) AS window_days, n_from,"
        " n_converted,\n"
        "  CAST(CASE WHEN n_from > 0 THEN (1000000 * n_converted)"
        " // n_from END AS BIGINT) AS conv_micros\n"
        "FROM cw_w"
    )


def cka_halves_sql(split: int = 32, d: int = 64) -> str:
    """Mirror of operators.similarity.cka_halves: milli-quantized
    vertical features, exact n-scaled centering, three integer gram
    matrices with HUGEINT squared-cell sums, one identically-shaped
    final float."""
    return (
        "WITH ck_q AS MATERIALIZED (\n"
        "  SELECT vec_id AS id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000, 0)"
        " AS BIGINT) AS val\n"
        f"  FROM embeddings, range(1, {d + 1}) t(i)),\n"
        "ck_m AS MATERIALIZED (SELECT pos,"
        " CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(val) AS BIGINT) AS s FROM ck_q GROUP BY pos),\n"
        "ck_c AS MATERIALIZED (\n"
        "  SELECT q.id, q.pos,\n"
        "    CAST(m.n * q.val - m.s AS BIGINT) AS c\n"
        "  FROM ck_q q JOIN ck_m m ON m.pos = q.pos),\n"
        f"ck_a AS MATERIALIZED (SELECT id, pos AS i, c AS ca"
        f" FROM ck_c WHERE pos < {split}),\n"
        f"ck_b AS MATERIALIZED (SELECT id, pos - {split} AS j, c AS cb"
        f" FROM ck_c WHERE pos >= {split}),\n"
        "ck_ab AS (SELECT sum(CAST(g AS HUGEINT) * g) AS s_ab FROM (\n"
        "  SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS g\n"
        "  FROM ck_a a JOIN ck_b b USING (id) GROUP BY a.i, b.j)),\n"
        "ck_aa AS (SELECT sum(CAST(g AS HUGEINT) * g) AS s_aa FROM (\n"
        "  SELECT CAST(sum(a.ca * a2.ca) AS BIGINT) AS g\n"
        "  FROM ck_a a JOIN ck_a a2 USING (id) GROUP BY a.i, a2.i)),\n"
        "ck_bb AS (SELECT sum(CAST(g AS HUGEINT) * g) AS s_bb FROM (\n"
        "  SELECT CAST(sum(b.cb * b2.cb) AS BIGINT) AS g\n"
        "  FROM ck_b b JOIN ck_b b2 USING (id) GROUP BY b.j, b2.j)),\n"
        "ck_n AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors"
        " FROM embeddings)\n"
        "SELECT n_vectors,\n"
        "  CAST(CASE WHEN s_aa > 0 AND s_bb > 0 THEN\n"
        "    round(1000000.0 * CAST(s_ab AS DOUBLE)\n"
        "      / sqrt(CAST(s_aa AS DOUBLE) * CAST(s_bb AS DOUBLE)))\n"
        "  END AS BIGINT) AS cka_micros\n"
        "FROM ck_n, ck_ab, ck_aa, ck_bb"
    )


def effective_rank_sql(d: int = 64) -> str:
    """Mirror of operators.similarity.effective_rank_embeddings:
    centi-quantized n-scaled centered features, one BIGINT gram,
    HUGEINT trace-square and Frobenius sums, truncating micros
    division."""
    return (
        "WITH er_q AS MATERIALIZED (\n"
        "  SELECT vec_id AS id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 100, 0)"
        " AS BIGINT) AS val\n"
        f"  FROM embeddings, range(1, {d + 1}) t(i)),\n"
        "er_m AS MATERIALIZED (SELECT pos,"
        " CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(val) AS BIGINT) AS s FROM er_q GROUP BY pos),\n"
        "er_c AS MATERIALIZED (\n"
        "  SELECT q.id, q.pos AS i,\n"
        "    CAST(m.n * q.val - m.s AS BIGINT) AS c\n"
        "  FROM er_q q JOIN er_m m ON m.pos = q.pos),\n"
        "er_g AS MATERIALIZED (\n"
        "  SELECT a.i, b.i AS j, CAST(sum(a.c * b.c) AS BIGINT) AS g\n"
        "  FROM er_c a JOIN er_c b USING (id) GROUP BY a.i, b.i),\n"
        "er_a AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n_dims,\n"
        "  CAST(sum(CASE WHEN i = j THEN g END) AS HUGEINT) AS tr,\n"
        "  sum(CAST(g AS HUGEINT) * g) AS fro2 FROM er_g),\n"
        "er_n AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors"
        " FROM embeddings)\n"
        "SELECT n_vectors, n_dims,\n"
        "  CAST(CASE WHEN fro2 > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * tr * tr) // fro2\n"
        "  END AS BIGINT) AS er_micros\n"
        "FROM er_n, er_a"
    )


def lm_heldout_nll_sql(test_mod: int = 5) -> str:
    """Mirror of operators.ngram_lm.lm_heldout_nll: hash48 doc split,
    train-only model with add-one smoothing, left-join backoff costs
    rounded once per distinct test pair, truncating mean."""
    h = _h48("'lmsplit:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH lt AS MATERIALIZED (SELECT doc_id,
  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks,
  ({h} % {test_mod} = 0) AS is_test
  FROM documents),
bgt AS MATERIALIZED (
  SELECT doc_id, is_test, toks[CAST(i AS INT)] AS w1,
         toks[CAST(i AS INT) + 1] AS w2
  FROM lt, UNNEST(range(1, len(toks))) AS t(i)),
c12 AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
  FROM bgt WHERE NOT is_test GROUP BY 1, 2),
c1 AS MATERIALIZED (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1
  FROM c12 GROUP BY 1),
vocab AS (SELECT count(DISTINCT tok) AS v FROM
  (SELECT unnest(toks) AS tok FROM lt WHERE NOT is_test)),
tp AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS m
  FROM bgt WHERE is_test GROUP BY 1, 2),
sc AS MATERIALIZED (
  SELECT tp.m,
    CASE WHEN c12.n12 IS NULL THEN 1 ELSE 0 END AS unseen,
    CAST(round(1000000.0 * ln(
      CAST(COALESCE(c1.n1, 0) + (SELECT v FROM vocab) AS DOUBLE)
      / (COALESCE(c12.n12, 0) + 1.0))) AS BIGINT) AS cost
  FROM tp LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)),
nd AS (SELECT
  CAST(sum(CASE WHEN is_test THEN 0 ELSE 1 END) AS BIGINT)
    AS n_train_docs,
  CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
    AS n_test_docs FROM lt),
ag AS (SELECT CAST(COALESCE(sum(m), 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(sum(m * unseen), 0) AS BIGINT) AS n_unseen,
  CAST(COALESCE(sum(m * cost), 0) AS BIGINT) AS tot FROM sc)
SELECT n_train_docs, n_test_docs, n_bigrams, n_unseen,
  CAST(CASE WHEN n_bigrams > 0 THEN tot // n_bigrams ELSE 0 END
    AS BIGINT) AS avg_nll_micros
FROM nd, ag
"""


def guimera_amaral_sql(
    lpa_iterations: int = 3, top_k: int = 20
) -> str:
    """Mirror of algos.community.guimera_amaral_roles over the LPA-N
    labeling: label-tagged undirected arcs, per-(vertex, community)
    counts, exact truncating participation, per-vertex rounded
    within-module z, (z DESC, id) top-k."""
    parts = _lpa_parts(lpa_iterations)
    joined = ",\n".join(parts)
    body = (
        f", {joined},\n"
        "ga_t AS MATERIALIZED (\n"
        "  SELECT u.src, ls.label AS own, ld.label AS c\n"
        f"  FROM und u JOIN l{lpa_iterations} ls ON ls.id = u.src\n"
        f"  JOIN l{lpa_iterations} ld ON ld.id = u.dst),\n"
        "ga_p AS MATERIALIZED (\n"
        "  SELECT src AS id, own, c, CAST(count(*) AS BIGINT) AS kc\n"
        "  FROM ga_t GROUP BY 1, 2, 3),\n"
        "ga_v AS MATERIALIZED (\n"
        "  SELECT id, own, CAST(sum(kc) AS BIGINT) AS k,\n"
        "    CAST(sum(kc * kc) AS BIGINT) AS ksq,\n"
        "    CAST(sum(CASE WHEN c = own THEN kc ELSE 0 END) AS BIGINT)"
        " AS kw\n"
        "  FROM ga_p GROUP BY 1, 2),\n"
        "ga_m AS MATERIALIZED (\n"
        "  SELECT own, CAST(count(*) AS BIGINT) AS nm,\n"
        "    CAST(sum(kw) AS BIGINT) AS sm,\n"
        "    CAST(sum(kw * kw) AS BIGINT) AS qm\n"
        "  FROM ga_v GROUP BY own)\n"
        "SELECT v.id, v.k AS degree, v.kw AS k_within,\n"
        "  CAST(1000000 - (1000000 * v.ksq) // (v.k * v.k) AS BIGINT)"
        " AS participation_micros,\n"
        "  CAST(CASE WHEN m.nm * m.qm - m.sm * m.sm > 0 THEN\n"
        "    round((m.nm * v.kw - m.sm)\n"
        "      / sqrt(m.nm * m.qm - m.sm * m.sm) * 1000000)\n"
        "  ELSE 0 END AS BIGINT) AS z_micros\n"
        "FROM ga_v v JOIN ga_m m USING (own)\n"
        f"ORDER BY z_micros DESC, v.id ASC LIMIT {top_k}"
    )
    return _graph_query(body)


def naive_bayes_calibration_sql(
    labels: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    words: tuple[str, ...] = tuple(STOPWORDS),
    n_bins: int = 10,
) -> str:
    """Mirror of operators.classify.naive_bayes_calibration: the shared
    prediction CTEs with per-doc posterior share, equal-width bins,
    truncating per-bin statistics."""
    width = 1_000_000 // n_bins
    return (
        _naive_bayes_pred_ctes(labels, words)
        + ",\nec_a AS MATERIALIZED (\n"
        "  SELECT doc_id, true_label, cand, s,\n"
        "    row_number() OVER (PARTITION BY doc_id"
        " ORDER BY s DESC, cand DESC) AS rk,\n"
        "    sum(s) OVER (PARTITION BY doc_id) AS ssum\n"
        "  FROM nbs),\n"
        "ec_c AS MATERIALIZED (\n"
        "  SELECT CASE WHEN cand = true_label THEN 1 ELSE 0 END"
        " AS correct,\n"
        "    CAST(CASE WHEN ssum > 0 THEN (1000000 * s) // ssum"
        " ELSE 0 END AS BIGINT) AS conf\n"
        "  FROM ec_a WHERE rk = 1)\n"
        "SELECT CAST(least(conf // "
        f"{width}, {n_bins - 1}) AS INT) AS bin,\n"
        "  CAST(count(*) AS BIGINT) AS n_docs,\n"
        "  CAST(CAST(sum(conf) AS BIGINT) // count(*) AS BIGINT)"
        " AS avg_conf_micros,\n"
        "  CAST((1000000 * sum(correct)) // count(*) AS BIGINT)"
        " AS acc_micros,\n"
        "  CAST(abs((1000000 * sum(correct)) // count(*)\n"
        "    - CAST(sum(conf) AS BIGINT) // count(*)) AS BIGINT)"
        " AS gap_micros\n"
        "FROM ec_c GROUP BY 1"
    )


def energy_distance_2sample_sql(
    type_a: str = "purchase", type_b: str = "click",
    value_col: str = "value",
) -> str:
    """Mirror of operators.analytics.energy_distance_2sample: sorted
    alphabet gaps, cumulative pair-separation sums, the cleared-
    denominator HUGEINT truncating micros division."""
    return (
        "WITH ed_s AS MATERIALIZED (\n"
        f"  SELECT CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END"
        " AS is_a,\n"
        f"    CAST(round({value_col} * 100) AS BIGINT) AS v\n"
        f"  FROM events WHERE event_type IN ('{type_a}', '{type_b}')),\n"
        "ed_p AS MATERIALIZED (SELECT v,"
        " CAST(count(*) AS BIGINT) AS cnt,\n"
        "  CAST(sum(is_a) AS BIGINT) AS ca FROM ed_s GROUP BY v),\n"
        "ed_t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,\n"
        "  CAST(sum(cnt - ca) AS BIGINT) AS nb FROM ed_p),\n"
        "ed_c AS MATERIALIZED (\n"
        "  SELECT sum(ca) OVER wc AS cuma,\n"
        "    sum(cnt) OVER wc - sum(ca) OVER wc AS cumb,\n"
        "    lead(v) OVER (ORDER BY v) - v AS g\n"
        "  FROM ed_p WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW)),\n"
        "ed_a AS (SELECT\n"
        "  (SELECT na FROM ed_t) AS na, (SELECT nb FROM ed_t) AS nb,\n"
        "  CAST(COALESCE(sum(g * (cuma * ((SELECT nb FROM ed_t)"
        " - cumb)\n"
        "    + cumb * ((SELECT na FROM ed_t) - cuma))), 0) AS BIGINT)"
        " AS sab,\n"
        "  CAST(COALESCE(sum(g * 2 * cuma * ((SELECT na FROM ed_t)"
        " - cuma)), 0) AS BIGINT) AS saa,\n"
        "  CAST(COALESCE(sum(g * 2 * cumb * ((SELECT nb FROM ed_t)"
        " - cumb)), 0) AS BIGINT) AS sbb\n"
        "  FROM ed_c)\n"
        "SELECT na AS n_a, nb AS n_b,\n"
        "  CAST(CASE WHEN na > 0 AND nb > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT)\n"
        "     * (2 * (CAST(sab AS HUGEINT) * na * nb)\n"
        "        - CAST(saa AS HUGEINT) * nb * nb\n"
        "        - CAST(sbb AS HUGEINT) * na * na))\n"
        "    // (CAST(na AS HUGEINT) * na * nb * nb)\n"
        "  END AS BIGINT) AS e_micros\n"
        "FROM ed_a"
    )


def umass_coherence_sql(top_n: int = 5) -> str:
    """Mirror of operators.tfidf.umass_coherence: per-source
    (count DESC, term ASC) panels, global doc-frequency and panel-
    restricted co-document counts, per-pair micro-rounded ln terms,
    exact sums."""
    return (
        "WITH um_i AS MATERIALIZED (\n"
        "  SELECT DISTINCT source AS s, doc_id AS d, w FROM (\n"
        "    SELECT source, doc_id, unnest(list_filter(\n"
        "      string_split_regex(lower(text), '\\s+'), x -> x <> ''))"
        " AS w\n"
        "    FROM documents)),\n"
        "um_df AS MATERIALIZED (SELECT w,"
        " CAST(count(DISTINCT d) AS BIGINT) AS dw\n"
        "  FROM um_i GROUP BY w),\n"
        "um_c AS MATERIALIZED (\n"
        "  SELECT source AS s, w, CAST(count(*) AS BIGINT) AS c"
        " FROM (\n"
        "    SELECT source, unnest(list_filter(\n"
        "      string_split_regex(lower(text), '\\s+'), x -> x <> ''))"
        " AS w\n"
        "    FROM documents) GROUP BY 1, 2),\n"
        "um_p AS MATERIALIZED (SELECT s, w, r FROM (\n"
        "  SELECT s, w, row_number() OVER (PARTITION BY s\n"
        "    ORDER BY c DESC, w ASC) AS r FROM um_c)"
        f" WHERE r <= {top_n}),\n"
        "um_pw AS (SELECT DISTINCT w FROM um_p),\n"
        "um_ip AS MATERIALIZED (\n"
        "  SELECT DISTINCT i.d, i.w FROM um_i i"
        " JOIN um_pw p ON p.w = i.w),\n"
        "um_cd AS MATERIALIZED (\n"
        "  SELECT a.w AS wi, b.w AS wj,"
        " CAST(count(DISTINCT a.d) AS BIGINT) AS dij\n"
        "  FROM um_ip a JOIN um_ip b ON b.d = a.d AND b.w <> a.w\n"
        "  GROUP BY 1, 2),\n"
        "um_sc AS MATERIALIZED (\n"
        "  SELECT pa.s,\n"
        "    CAST(round(1000000.0 * ln(\n"
        "      CAST(COALESCE(cd.dij, 0) + 1 AS DOUBLE)"
        " / CAST(df.dw AS DOUBLE)\n"
        "    )) AS BIGINT) AS term\n"
        "  FROM um_p pa JOIN um_p pb ON pb.s = pa.s AND pa.r < pb.r\n"
        "  LEFT JOIN um_cd cd ON cd.wi = pa.w AND cd.wj = pb.w\n"
        "  JOIN um_df df ON df.w = pb.w),\n"
        "um_nt AS (SELECT s AS source,"
        " CAST(count(*) AS BIGINT) AS n_terms FROM um_p GROUP BY s)\n"
        "SELECT t.source, t.n_terms,\n"
        "  CAST(count(*) AS BIGINT) AS n_pairs,\n"
        "  CAST(sum(c.term) AS BIGINT) AS coherence_micros\n"
        "FROM um_sc c JOIN um_nt t ON t.source = c.s\n"
        "GROUP BY 1, 2"
    )


def mean_excess_curve_sql(
    deciles: tuple = (5, 6, 7, 8, 9), value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.mean_excess_curve: alphabet
    cumulative + rank-rule thresholds, tail sums, truncating mean."""
    dlit = ", ".join(str(int(d)) for d in deciles)
    return (
        "WITH me_p AS MATERIALIZED (\n"
        f"  SELECT CAST(round({value_col} * 100) AS BIGINT) AS v,\n"
        "    CAST(count(*) AS BIGINT) AS cnt\n"
        "  FROM events GROUP BY 1),\n"
        "me_n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM me_p),\n"
        "me_c AS MATERIALIZED (\n"
        "  SELECT v, cnt, (SELECT n FROM me_n) AS n,\n"
        "    sum(cnt) OVER wc AS cum,\n"
        "    sum(cnt) OVER wc - cnt AS cum_prev,\n"
        "    (SELECT n FROM me_n) - sum(cnt) OVER wc AS tail_cnt,\n"
        "    sum(cnt * v) OVER () - sum(cnt * v) OVER wc AS tail_sum\n"
        "  FROM me_p WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW))\n"
        "SELECT CAST(d.decile AS INT) AS decile,\n"
        "  c.v AS threshold_cents,\n"
        "  CAST(c.tail_cnt AS BIGINT) AS n_exceed,\n"
        "  CAST(CASE WHEN c.tail_cnt > 0 THEN\n"
        "    (c.tail_sum - c.v * c.tail_cnt) // c.tail_cnt"
        " END AS BIGINT) AS mean_excess_cents\n"
        f"FROM me_c c, (SELECT unnest([{dlit}]) AS decile) d\n"
        "WHERE c.cum_prev < (c.n * d.decile) // 10\n"
        "  AND (c.n * d.decile) // 10 <= c.cum"
    )


def source_cross_entropy_sql() -> str:
    """Mirror of operators.ngram_lm.source_cross_entropy: per-source
    bigram models, eval-pair × model fan-out with left-join backoff,
    per-cell micro-rounded costs, truncating means."""
    return """
WITH sx_t AS MATERIALIZED (SELECT source AS s,
  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
sx_b AS MATERIALIZED (
  SELECT s, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM sx_t, UNNEST(range(1, len(toks))) AS t(i)),
sx_12 AS MATERIALIZED (SELECT s, w1, w2,
  CAST(count(*) AS BIGINT) AS n12 FROM sx_b GROUP BY 1, 2, 3),
sx_1 AS MATERIALIZED (SELECT s, w1, CAST(sum(n12) AS BIGINT) AS n1
  FROM sx_12 GROUP BY 1, 2),
sx_v AS MATERIALIZED (SELECT s, CAST(count(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT s, unnest(toks) AS tok FROM sx_t) GROUP BY s),
sx_sc AS MATERIALIZED (
  SELECT e.s AS se, m.s AS sm, e.n12 AS mm,
    CAST(round(1000000.0 * ln(
      CAST(COALESCE(c1.n1, 0) + m.v AS DOUBLE)
      / (COALESCE(c12.n12, 0) + 1.0))) AS BIGINT) AS cost
  FROM sx_12 e CROSS JOIN sx_v m
  LEFT JOIN sx_12 c12 ON c12.s = m.s AND c12.w1 = e.w1 AND c12.w2 = e.w2
  LEFT JOIN sx_1 c1 ON c1.s = m.s AND c1.w1 = e.w1)
SELECT se AS eval_source, sm AS model_source,
  CAST(sum(mm) AS BIGINT) AS n_bigrams,
  CAST(CAST(sum(mm * cost) AS BIGINT) // sum(mm) AS BIGINT)
    AS avg_nll_micros
FROM sx_sc GROUP BY 1, 2
"""


def circadian_concentration_sql() -> str:
    """Mirror of operators.analytics.circadian_concentration: 24
    per-hour micro-rounded unit-vector terms, exact integer blends,
    identically-shaped resultant-length and Rayleigh floats."""
    return (
        "WITH cc_p AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 3600000000)"
        " % 24 AS INT) AS h,\n"
        "    CAST(count(*) AS BIGINT) AS c\n"
        "  FROM events GROUP BY 1),\n"
        "cc_t AS MATERIALIZED (\n"
        "  SELECT c,\n"
        "    CAST(round(cos(2.0 * pi() * CAST(h AS DOUBLE) / 24.0)"
        " * 1000000) AS BIGINT) AS xt,\n"
        "    CAST(round(sin(2.0 * pi() * CAST(h AS DOUBLE) / 24.0)"
        " * 1000000) AS BIGINT) AS yt\n"
        "  FROM cc_p),\n"
        "cc_a AS (SELECT CAST(sum(c) AS BIGINT) AS n,\n"
        "  CAST(sum(c * xt) AS BIGINT) AS xs,\n"
        "  CAST(sum(c * yt) AS BIGINT) AS ys FROM cc_t)\n"
        "SELECT n AS n_events, xs AS x_sum, ys AS y_sum,\n"
        "  CAST(CASE WHEN n > 0 THEN round(sqrt(\n"
        "    CAST(xs AS DOUBLE) * xs + CAST(ys AS DOUBLE) * ys) / n)"
        " END AS BIGINT) AS r_micros,\n"
        "  CAST(CASE WHEN n > 0 THEN round(\n"
        "    (CAST(xs AS DOUBLE) * xs + CAST(ys AS DOUBLE) * ys)\n"
        "    / (CAST(n AS DOUBLE) * 1000000.0)) END AS BIGINT)"
        " AS rayleigh_z2_micros\n"
        "FROM cc_a"
    )


def neyman_allocation_sql(
    budget: int = 1000, group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """Mirror of operators.analytics.neyman_allocation: exact stratum
    moments, per-stratum micro-rounded sd, truncating share and
    allocation divisions."""
    return (
        "WITH ny_p AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS stratum,\n"
        "    CAST(count(*) AS BIGINT) AS n_h,\n"
        f"    CAST(sum(CAST(round({value_col} * 100) AS BIGINT))"
        " AS BIGINT) AS s,\n"
        f"    CAST(sum(CAST(round({value_col} * 100) AS BIGINT)\n"
        f"      * CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)"
        " AS q\n"
        "  FROM events GROUP BY 1),\n"
        "ny_s AS MATERIALIZED (\n"
        "  SELECT stratum, n_h,\n"
        "    CAST(round(sqrt(CAST(n_h * q - s * s AS DOUBLE))"
        " / n_h * 1000000) AS BIGINT) AS sd_cents_micros\n"
        "  FROM ny_p),\n"
        "ny_w AS MATERIALIZED (SELECT stratum, n_h, sd_cents_micros,\n"
        "  CAST(n_h * sd_cents_micros AS BIGINT) AS w FROM ny_s),\n"
        "ny_t AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM ny_w)\n"
        "SELECT stratum, n_h, sd_cents_micros,\n"
        "  CAST(CASE WHEN wt > 0 THEN"
        " (CAST(1000000 AS HUGEINT) * w) // CAST(wt AS HUGEINT) END"
        " AS BIGINT) AS share_micros,\n"
        f"  CAST(CASE WHEN wt > 0 THEN"
        f" (CAST({int(budget)} AS HUGEINT) * w) // CAST(wt AS HUGEINT)"
        " END AS BIGINT) AS n_alloc\n"
        "FROM ny_w, ny_t"
    )


def power_sample_size_sql(
    cohort_type: str = "signup", convert_type: str = "purchase",
    relative_mde_micros: int = 100_000,
    z_alpha: float = 1.959964, z_beta: float = 0.841621,
) -> str:
    """Mirror of operators.analytics.power_sample_size: exact micros
    baseline, one identically-shaped float sample-size expression,
    ceil."""
    return (
        "WITH pw_p AS MATERIALIZED (\n"
        "  SELECT user_id,\n"
        f"    max(CASE WHEN event_type = '{cohort_type}' THEN 1"
        " ELSE 0 END) AS a,\n"
        f"    max(CASE WHEN event_type = '{convert_type}' THEN 1"
        " ELSE 0 END) AS c\n"
        "  FROM events GROUP BY 1),\n"
        "pw_b AS (SELECT CAST(count(*) AS BIGINT) AS n_users,\n"
        "  CAST(sum(c) AS BIGINT) AS conv FROM pw_p WHERE a = 1),\n"
        "pw_1 AS (SELECT n_users,\n"
        "  CAST((1000000 * conv) // n_users AS BIGINT) AS p1_micros\n"
        "  FROM pw_b),\n"
        "pw_2 AS (SELECT n_users, p1_micros,\n"
        "  CAST((p1_micros * (1000000 +"
        f" {int(relative_mde_micros)})) // 1000000 AS BIGINT)"
        " AS p2_micros\n"
        "  FROM pw_1)\n"
        "SELECT n_users, p1_micros, p2_micros,\n"
        "  CAST(CASE WHEN p2_micros > p1_micros"
        " AND p2_micros < 1000000 THEN\n"
        f"    ceil(pow({z_alpha}\n"
        "      * sqrt(2.0 * ((p1_micros + p2_micros) / 2000000.0)\n"
        "        * (1.0 - (p1_micros + p2_micros) / 2000000.0))\n"
        f"      + {z_beta}\n"
        "      * sqrt((p1_micros / 1000000.0)"
        " * (1.0 - p1_micros / 1000000.0)\n"
        "        + (p2_micros / 1000000.0)"
        " * (1.0 - p2_micros / 1000000.0)), 2.0)\n"
        "    / pow((p2_micros - p1_micros) / 1000000.0, 2.0))\n"
        "  END AS BIGINT) AS n_per_arm\n"
        "FROM pw_2"
    )


def ols2_user_value_sql() -> str:
    """Mirror of operators.analytics.ols2_user_value: per-user
    (count, distinct-types, cents) aggregates, m-scaled centered
    moments, Cramér 2×2 on HUGEINT with truncating micros divisions,
    the one 6dp R²."""
    return (
        "WITH o2_p AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS x1,\n"
        "    CAST(count(DISTINCT event_type) AS BIGINT) AS x2,\n"
        "    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS y\n"
        "  FROM events GROUP BY 1),\n"
        "o2_m AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(x1) AS BIGINT) AS s1,"
        " CAST(sum(x2) AS BIGINT) AS s2,\n"
        "  CAST(sum(y) AS BIGINT) AS sy,\n"
        "  CAST(sum(x1 * x1) AS BIGINT) AS p11,"
        " CAST(sum(x2 * x2) AS BIGINT) AS p22,\n"
        "  CAST(sum(x1 * x2) AS BIGINT) AS p12,"
        " CAST(sum(x1 * y) AS BIGINT) AS p1y,\n"
        "  CAST(sum(x2 * y) AS BIGINT) AS p2y,"
        " CAST(sum(y * y) AS BIGINT) AS pyy FROM o2_p),\n"
        "o2_c AS (SELECT n, s1, s2, sy,\n"
        "  CAST(n * p11 - s1 * s1 AS BIGINT) AS s11,\n"
        "  CAST(n * p22 - s2 * s2 AS BIGINT) AS s22,\n"
        "  CAST(n * p12 - s1 * s2 AS BIGINT) AS s12,\n"
        "  CAST(n * p1y - s1 * sy AS BIGINT) AS s1y,\n"
        "  CAST(n * p2y - s2 * sy AS BIGINT) AS s2y,\n"
        "  CAST(n * pyy - sy * sy AS BIGINT) AS syy FROM o2_m),\n"
        "o2_b AS (SELECT n, s1, s2, sy, syy, s1y, s2y,\n"
        "  CAST(s11 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s12"
        " AS dd,\n"
        "  CAST(s1y AS HUGEINT) * s22 - CAST(s2y AS HUGEINT) * s12"
        " AS n1,\n"
        "  CAST(s2y AS HUGEINT) * s11 - CAST(s1y AS HUGEINT) * s12"
        " AS n2\n"
        "  FROM o2_c)\n"
        "SELECT n,\n"
        "  CAST(CASE WHEN dd > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * n1) // dd END AS BIGINT)"
        " AS b1_micros,\n"
        "  CAST(CASE WHEN dd > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * n2) // dd END AS BIGINT)"
        " AS b2_micros,\n"
        "  CAST(CASE WHEN dd > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * sy * dd\n"
        "     - CAST(1000000 AS HUGEINT) * (n1 * s1 + n2 * s2))\n"
        "    // (CAST(n AS HUGEINT) * dd) END AS BIGINT)"
        " AS intercept_micros,\n"
        "  CASE WHEN dd > 0 AND syy > 0 THEN\n"
        "    round((CAST(n1 AS DOUBLE) * CAST(s1y AS DOUBLE)\n"
        "      + CAST(n2 AS DOUBLE) * CAST(s2y AS DOUBLE))\n"
        "      / (CAST(dd AS DOUBLE) * CAST(syy AS DOUBLE)), 6)\n"
        "  END AS r2\n"
        "FROM o2_b"
    )


def gk_lambda_type_dow_sql() -> str:
    """Mirror of operators.analytics.gk_lambda over (epoch dow,
    event_type): all-integer modal-error counts, one truncating
    micros division."""
    return (
        "WITH gk_j AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS x,\n"
        "    event_type AS y, CAST(count(*) AS BIGINT) AS c\n"
        "  FROM events GROUP BY 1, 2),\n"
        "gk_n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM gk_j),\n"
        "gk_y AS (SELECT CAST(max(cy) AS BIGINT) AS maxy FROM (\n"
        "  SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM gk_j"
        " GROUP BY y)),\n"
        "gk_x AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_mx FROM (\n"
        "  SELECT x, CAST(max(c) AS BIGINT) AS mx FROM gk_j"
        " GROUP BY x))\n"
        "SELECT n, CAST(n - maxy AS BIGINT) AS err_marginal,\n"
        "  CAST(n - sum_mx AS BIGINT) AS err_conditional,\n"
        "  CAST(CASE WHEN n - maxy > 0 THEN\n"
        "    (1000000 * (sum_mx - maxy)) // (n - maxy) END AS BIGINT)"
        " AS lambda_micros\n"
        "FROM gk_n, gk_y, gk_x"
    )


def james_stein_type_means_sql(
    group_col: str = "event_type", value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.james_stein_type_means:
    truncating micro means, one identically-shaped shrink-factor
    float rounded to micros, exact integer blend."""
    return (
        "WITH js_p AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS \"group\","
        " CAST(count(*) AS BIGINT) AS n_h,\n"
        f"    CAST(sum(CAST(round({value_col} * 100) AS BIGINT))"
        " AS BIGINT) AS s,\n"
        f"    CAST(sum(CAST(round({value_col} * 100) AS BIGINT)\n"
        f"      * CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)"
        " AS q\n"
        "  FROM events GROUP BY 1),\n"
        "js_r AS MATERIALIZED (SELECT \"group\", n_h, s, q,\n"
        "  CAST((CAST(1000000 AS HUGEINT) * s) // CAST(n_h AS HUGEINT)"
        " AS BIGINT) AS raw_m FROM js_p),\n"
        "js_t AS (SELECT CAST(count(*) AS BIGINT) AS k,\n"
        "  CAST(sum(n_h) AS BIGINT) AS nt,"
        " CAST(sum(s) AS BIGINT) AS st,\n"
        "  CAST(sum(q) AS BIGINT) AS qt,\n"
        "  CAST(CAST(sum(raw_m) AS BIGINT) // count(*) AS BIGINT)"
        " AS grand_m FROM js_r),\n"
        "js_s AS (SELECT sum(CAST(r.raw_m - t.grand_m AS HUGEINT)\n"
        "    * (r.raw_m - t.grand_m)) AS ss FROM js_r r, js_t t)\n"
        "SELECT r.\"group\", r.n_h,\n"
        "  r.raw_m AS raw_mean_cents_micros,\n"
        "  CAST(CASE WHEN t.k >= 4 AND x.ss > 0 THEN\n"
        "    t.grand_m + (CAST(round(greatest(0.0, 1.0 - (t.k - 3)\n"
        "      * ((CAST(t.qt AS DOUBLE) / t.nt\n"
        "          - pow(CAST(t.st AS DOUBLE) / t.nt, 2.0))\n"
        "         * 1e12 * t.k / t.nt)\n"
        "      / CAST(x.ss AS DOUBLE)) * 1000000) AS BIGINT)\n"
        "      * (r.raw_m - t.grand_m)) // 1000000\n"
        "  ELSE r.raw_m END AS BIGINT) AS shrunk_mean_cents_micros\n"
        "FROM js_r r, js_t t, js_s x"
    )


def algebraic_distance_sql(
    iterations: int = 5, top_k: int = 20
) -> str:
    """Mirror of algos.centrality.algebraic_distance: hash48 micro
    starts, unrolled integer Jacobi sweeps over und (isolated
    vertices keep x), u<v edge distances, (dist, src, dst) top-k."""
    h = _h48("'algdist:' || CAST(id AS VARCHAR)")
    parts = [
        "ad_d AS MATERIALIZED (SELECT src,"
        " CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY src)",
        f"ax0 AS MATERIALIZED (SELECT id,"
        f" CAST({h} % 1000000 AS BIGINT) AS x FROM vertices)",
    ]
    for r in range(1, iterations + 1):
        prev = f"ax{r - 1}"
        parts.append(
            f"ax{r} AS MATERIALIZED (\n"
            f"  SELECT v.id, CAST(CASE WHEN m.s IS NOT NULL"
            " AND d.deg > 0 THEN\n"
            "      (v.x + (m.s // d.deg)) // 2 ELSE v.x END"
            " AS BIGINT) AS x\n"
            f"  FROM {prev} v\n"
            "  LEFT JOIN (SELECT u.dst AS id, CAST(SUM(p.x) AS BIGINT)"
            " AS s\n"
            f"    FROM und u JOIN {prev} p ON p.id = u.src\n"
            "    GROUP BY u.dst) m ON m.id = v.id\n"
            "  LEFT JOIN ad_d d ON d.src = v.id)"
        )
    joined = ",\n".join(parts)
    body = (
        f", {joined}\n"
        "SELECT e.src, e.dst,\n"
        "  CAST(abs(a.x - b.x) AS BIGINT) AS dist_micros\n"
        "FROM (SELECT src, dst FROM und WHERE src < dst) e\n"
        f"JOIN ax{iterations} a ON a.id = e.src\n"
        f"JOIN ax{iterations} b ON b.id = e.dst\n"
        f"ORDER BY dist_micros ASC, e.src ASC, e.dst ASC LIMIT {top_k}"
    )
    return _graph_query(body)


def adjusted_residuals_type_dow_sql(top_k: int = 10) -> str:
    """Mirror of operators.analytics.adjusted_residuals_type_dow:
    full lattice with structural zeros, cleared-denominator Haberman
    float rounded per cell, (|resid| DESC, dow, type) top-k."""
    return (
        "WITH ar_s AS MATERIALIZED (\n"
        "  SELECT event_type,\n"
        "    CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 3)"
        " % 7 AS INT) AS dow\n"
        "  FROM events),\n"
        "ar_c AS MATERIALIZED (SELECT dow, event_type,\n"
        "  CAST(count(*) AS BIGINT) AS o FROM ar_s GROUP BY 1, 2),\n"
        "ar_r AS (SELECT dow, CAST(sum(o) AS BIGINT) AS r FROM ar_c"
        " GROUP BY dow),\n"
        "ar_k AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS c"
        " FROM ar_c GROUP BY event_type),\n"
        "ar_n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ar_c),\n"
        "ar_l AS MATERIALIZED (\n"
        "  SELECT r.dow, k.event_type,\n"
        "    CAST(COALESCE(c.o, 0) AS BIGINT) AS observed,\n"
        "    r.r, k.c, (SELECT n FROM ar_n) AS n\n"
        "  FROM ar_r r CROSS JOIN ar_k k\n"
        "  LEFT JOIN ar_c c ON c.dow = r.dow"
        " AND c.event_type = k.event_type)\n"
        "SELECT dow, event_type, observed,\n"
        "  CAST(CASE WHEN r < n AND c < n THEN round(\n"
        "    1000000.0 * CAST(n * observed - r * c AS DOUBLE)\n"
        "    * sqrt(CAST(n AS DOUBLE))\n"
        "    / sqrt(CAST(r AS DOUBLE) * c * (n - r) * (n - c)))\n"
        "  ELSE 0 END AS BIGINT) AS resid_micros\n"
        "FROM ar_l\n"
        "ORDER BY abs(resid_micros) DESC, dow ASC, event_type ASC\n"
        f"LIMIT {top_k}"
    )


def lof_topk_sql(k: int = 5, top_k: int = 10, d: int = 64) -> str:
    """Mirror of operators.similarity.lof_topk: micro-quantized
    squared L2 kNN, k-distance, reachability, the 10²¹ fixed-point
    lrd, per-stage truncating LOF, (lof DESC, id) top-k."""
    return (
        "WITH lf_q AS MATERIALIZED (\n"
        "  SELECT vec_id AS id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000, 0)"
        " AS BIGINT) AS qv\n"
        f"  FROM embeddings, range(1, {d + 1}) t(i)),\n"
        "lf_d AS MATERIALIZED (\n"
        "  SELECT a.id, b.id AS nid,\n"
        "    CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2\n"
        "  FROM lf_q a JOIN lf_q b ON b.pos = a.pos AND b.id <> a.id\n"
        "  GROUP BY a.id, b.id),\n"
        "lf_k AS MATERIALIZED (\n"
        "  SELECT id, nid, d2 FROM (\n"
        "    SELECT id, nid, d2, row_number() OVER (PARTITION BY id\n"
        "      ORDER BY d2 ASC, nid ASC) AS rank FROM lf_d)\n"
        f"  WHERE rank <= {k}),\n"
        "lf_kd AS MATERIALIZED (SELECT id,"
        " CAST(max(d2) AS BIGINT) AS kdist FROM lf_k GROUP BY id),\n"
        "lf_r AS MATERIALIZED (\n"
        "  SELECT n.id, n.nid,\n"
        "    CAST(greatest(kd.kdist, n.d2) AS BIGINT) AS reach\n"
        "  FROM lf_k n JOIN lf_kd kd ON kd.id = n.nid),\n"
        "lf_l AS MATERIALIZED (\n"
        "  SELECT id, CAST((CAST(1000000000000000000000 AS HUGEINT)\n"
        f"    * {k}) // CAST(sum(reach) AS HUGEINT) AS BIGINT) AS lrd\n"
        "  FROM lf_r GROUP BY id),\n"
        "lf_o AS MATERIALIZED (\n"
        "  SELECT n.id,\n"
        "    CAST(CASE WHEN l.lrd > 0 THEN\n"
        "      (CAST(sum(ln_.lrd) AS HUGEINT) * 1000000)\n"
        f"      // (CAST({k} AS HUGEINT) * l.lrd)\n"
        "    ELSE 0 END AS BIGINT) AS lof_micros\n"
        "  FROM lf_k n JOIN lf_l ln_ ON ln_.id = n.nid\n"
        "  JOIN lf_l l ON l.id = n.id\n"
        "  GROUP BY n.id, l.lrd)\n"
        "SELECT o.id, kd.kdist AS kdist_sq, l.lrd AS lrd_micros,\n"
        "  o.lof_micros\n"
        "FROM lf_o o JOIN lf_kd kd ON kd.id = o.id\n"
        "JOIN lf_l l ON l.id = o.id\n"
        f"ORDER BY o.lof_micros DESC, o.id ASC LIMIT {top_k}"
    )


def daily_motif_pair_sql(window: int = 7) -> str:
    """Mirror of operators.analytics.daily_motif_pair: zero-filled
    spine, full in-range windows via aligned offsets, exact BIGINT
    pair distances, (dist, day_a, day_b) argmin."""
    w = int(window)
    return (
        "WITH mo_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "mo_r AS (SELECT min(d) AS lo, max(d) AS hi FROM mo_d),\n"
        "mo_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM mo_r) sp\n"
        "  LEFT JOIN mo_d dl USING (d)),\n"
        "mo_o AS MATERIALIZED (\n"
        "  SELECT f.d - t.t AS s, t.t, f.y FROM mo_f f,\n"
        f"    (SELECT unnest(range(0, {w})) AS t) t\n"
        "  WHERE f.d - t.t >= (SELECT lo FROM mo_r)\n"
        f"    AND f.d - t.t + {w} - 1 <= (SELECT hi FROM mo_r)),\n"
        "mo_p AS MATERIALIZED (\n"
        "  SELECT a.s AS sa, b.s AS sb,\n"
        "    CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT)"
        " AS dist_sq\n"
        "  FROM mo_o a JOIN mo_o b ON b.t = a.t"
        f" AND b.s >= a.s + {w}\n"
        "  GROUP BY 1, 2),\n"
        "mo_n AS (SELECT CAST(count(DISTINCT s) AS BIGINT)"
        " AS n_windows FROM mo_o)\n"
        "SELECT sa AS day_a, sb AS day_b, dist_sq, n_windows\n"
        "FROM mo_p, mo_n\n"
        "ORDER BY dist_sq ASC, sa ASC, sb ASC LIMIT 1"
    )


def dbscan_labels_sql(
    min_pts: int = 5, knn_k: int = 5, rounds: int = 16, d: int = 64
) -> str:
    """Mirror of operators.similarity.dbscan_labels: micro-quantized
    distances, lower-median k-distance eps, core counts, exactly
    ``rounds`` unrolled min-label propagation rounds over the
    core-core eps graph, border = smallest core-neighbor label."""
    parts = [
        "db_q AS MATERIALIZED (\n"
        "  SELECT vec_id AS id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000, 0)"
        " AS BIGINT) AS qv\n"
        f"  FROM embeddings, range(1, {d + 1}) t(i))",
        "db_d AS MATERIALIZED (\n"
        "  SELECT a.id, b.id AS nid,\n"
        "    CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2\n"
        "  FROM db_q a JOIN db_q b ON b.pos = a.pos AND b.id <> a.id\n"
        "  GROUP BY a.id, b.id)",
        "db_kd AS MATERIALIZED (SELECT id, d2 AS kdist FROM (\n"
        "  SELECT id, d2, row_number() OVER (PARTITION BY id\n"
        "    ORDER BY d2 ASC, nid ASC) AS rank FROM db_d)\n"
        f"  WHERE rank = {knn_k})",
        "db_e AS (SELECT kdist AS eps_sq FROM (\n"
        "  SELECT kdist, row_number() OVER (ORDER BY kdist ASC,"
        " id ASC) AS rn,\n"
        "    CAST(count(*) OVER () AS BIGINT) AS n FROM db_kd)\n"
        "  WHERE rn = (n + n % 2) // 2)",
        "db_nr AS MATERIALIZED (SELECT id, nid FROM db_d\n"
        "  WHERE d2 <= (SELECT eps_sq FROM db_e))",
        "db_c AS MATERIALIZED (SELECT id FROM (\n"
        "  SELECT id, count(*) AS nn FROM db_nr GROUP BY id)\n"
        f"  WHERE nn >= {min_pts} - 1)",
        "db_ce AS MATERIALIZED (\n"
        "  SELECT n.id, n.nid FROM db_nr n\n"
        "  JOIN db_c x ON x.id = n.id JOIN db_c y ON y.id = n.nid)",
        "lb0 AS MATERIALIZED (SELECT id, id AS label FROM db_c)",
    ]
    for r in range(1, rounds + 1):
        prev = f"lb{r - 1}"
        parts.append(
            f"lb{r} AS MATERIALIZED (\n"
            f"  SELECT l.id, least(l.label, COALESCE(m.ml, l.label))"
            " AS label\n"
            f"  FROM {prev} l LEFT JOIN (\n"
            f"    SELECT e.id, min(p.label) AS ml\n"
            f"    FROM db_ce e JOIN {prev} p ON p.id = e.nid\n"
            "    GROUP BY e.id) m ON m.id = l.id)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "db_b AS MATERIALIZED (\n"
        "  SELECT n.id, CAST(min(p.label) AS BIGINT) AS blabel\n"
        "  FROM db_nr n\n"
        f"  JOIN lb{rounds} p ON p.id = n.nid\n"
        "  WHERE NOT EXISTS (SELECT 1 FROM db_c c WHERE c.id = n.id)\n"
        "  GROUP BY n.id)\n"
        "SELECT v.vec_id AS id,\n"
        "  CAST(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END AS INT)"
        " AS is_core,\n"
        "  CAST(COALESCE(l.label, b.blabel) AS BIGINT) AS cluster\n"
        "FROM embeddings v\n"
        "LEFT JOIN db_c c ON c.id = v.vec_id\n"
        f"LEFT JOIN lb{rounds} l ON l.id = v.vec_id\n"
        "LEFT JOIN db_b b ON b.id = v.vec_id"
    )


def kmeans_stability_ari_sql(
    k: int = 4, iterations: int = 2, d: int = 64
) -> str:
    """Mirror of operators.kmeans.kmeans_stability_ari: two
    half-filtered unrolled-Lloyd chains (same quantization, seed
    hash, tie rules as _kmeans_ctes, restricted to even/odd ids),
    full-corpus assignments to both codebooks, pair-count ARI."""
    h = _h48("'kmeans:' || CAST(vec_id AS VARCHAR)")
    parts = [
        "qe AS MATERIALIZED (\n"
        "  SELECT vec_id, t.i - 1 AS pos,\n"
        "    CAST(round(CAST(embedding[t.i] AS DOUBLE) * 1000000, 0)"
        " AS BIGINT) AS qv\n"
        f"  FROM embeddings, range(1, {d + 1}) t(i))",
    ]
    for sfx, par in (("_a", 0), ("_b", 1)):
        parts.append(
            f"sd{sfx} AS MATERIALIZED (\n"
            "  SELECT vec_id, row_number() OVER (ORDER BY h, vec_id)"
            " - 1 AS cl\n"
            f"  FROM (SELECT vec_id, {h} AS h FROM embeddings"
            f" WHERE vec_id % 2 = {par})\n"
            f"  ORDER BY h, vec_id LIMIT {k})"
        )
        parts.append(
            f"cent0{sfx} AS MATERIALIZED (\n"
            "  SELECT s.cl, q.pos, q.qv AS cv\n"
            f"  FROM sd{sfx} s JOIN qe q ON q.vec_id = s.vec_id)"
        )
        for r in range(1, iterations + 1):
            prev = f"cent{r - 1}{sfx}"
            parts.append(
                f"asg{r}{sfx} AS MATERIALIZED (\n"
                f"  SELECT vec_id, cl FROM (\n"
                f"    SELECT q.vec_id, c.cl,\n"
                f"      row_number() OVER (PARTITION BY q.vec_id"
                " ORDER BY\n"
                f"        sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl)"
                " AS rn\n"
                f"    FROM qe q JOIN {prev} c ON c.pos = q.pos\n"
                f"    WHERE q.vec_id % 2 = {par}\n"
                f"    GROUP BY q.vec_id, c.cl) WHERE rn = 1)"
            )
            parts.append(
                f"sums{r}{sfx} AS MATERIALIZED (\n"
                f"  SELECT a.cl, q.pos, sum(q.qv) AS s, count(*) AS n\n"
                f"  FROM asg{r}{sfx} a JOIN qe q"
                " ON q.vec_id = a.vec_id\n"
                f"  GROUP BY a.cl, q.pos)"
            )
            parts.append(
                f"cent{r}{sfx} AS MATERIALIZED (\n"
                f"  SELECT p.cl, p.pos,\n"
                f"    CAST(COALESCE(s.s // s.n, p.cv) AS BIGINT) AS cv\n"
                f"  FROM {prev} p LEFT JOIN sums{r}{sfx} s\n"
                f"    ON s.cl = p.cl AND s.pos = p.pos)"
            )
        parts.append(
            f"fin{sfx} AS MATERIALIZED (\n"
            "  SELECT vec_id, cl FROM (\n"
            "    SELECT q.vec_id, c.cl,\n"
            "      row_number() OVER (PARTITION BY q.vec_id ORDER BY\n"
            "        sum((q.qv - c.cv) * (q.qv - c.cv)), c.cl) AS rn\n"
            f"    FROM qe q JOIN cent{iterations}{sfx} c"
            " ON c.pos = q.pos\n"
            "    GROUP BY q.vec_id, c.cl) WHERE rn = 1)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined},\n"
        "st_ct AS MATERIALIZED (\n"
        "  SELECT a.cl AS ca, b.cl AS cb,"
        " CAST(count(*) AS BIGINT) AS c\n"
        "  FROM fin_a a JOIN fin_b b ON b.vec_id = a.vec_id\n"
        "  GROUP BY 1, 2),\n"
        "st_s AS (SELECT CAST(sum(c) AS BIGINT) AS n,\n"
        "  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS idx,\n"
        "  CAST(count(DISTINCT ca) AS BIGINT) AS ka,\n"
        "  CAST(count(DISTINCT cb) AS BIGINT) AS kb FROM st_ct),\n"
        "st_a AS (SELECT CAST(sum((a * (a - 1)) // 2) AS BIGINT)"
        " AS pa\n"
        "  FROM (SELECT ca, CAST(sum(c) AS BIGINT) AS a FROM st_ct"
        " GROUP BY ca)),\n"
        "st_b AS (SELECT CAST(sum((b * (b - 1)) // 2) AS BIGINT)"
        " AS pb\n"
        "  FROM (SELECT cb, CAST(sum(c) AS BIGINT) AS b FROM st_ct"
        " GROUP BY cb))\n"
        "SELECT n AS n_vectors, ka AS k_a, kb AS k_b,\n"
        "  CAST(CASE WHEN ((n * (n - 1)) // 2) * (pa + pb)"
        " - 2 * pa * pb <> 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * 2\n"
        "     * (((n * (n - 1)) // 2) * idx - pa * pb))\n"
        "    // CAST(((n * (n - 1)) // 2) * (pa + pb) - 2 * pa * pb"
        " AS HUGEINT)\n"
        "  END AS BIGINT) AS ari_micros\n"
        "FROM st_s, st_a, st_b"
    )


def user_weekly_rhythm_sql(lag: int = 7, top_k: int = 20) -> str:
    """Mirror of operators.analytics.user_weekly_rhythm: per-user
    n-scaled deviations on the shared spine, lag join, truncating
    micros ratio, (r7 DESC, user) top-k."""
    return (
        "WITH wr_d AS MATERIALIZED (\n"
        "  SELECT user_id AS u,\n"
        "    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1, 2),\n"
        "wr_r AS (SELECT min(d) AS lo, max(d) AS hi,\n"
        "  CAST(max(d) - min(d) + 1 AS BIGINT) AS n FROM wr_d),\n"
        "wr_s AS MATERIALIZED (SELECT u,"
        " CAST(sum(y) AS BIGINT) AS s FROM wr_d GROUP BY u),\n"
        "wr_l AS MATERIALIZED (\n"
        "  SELECT su.u, sp.d,\n"
        "    CAST((SELECT n FROM wr_r) * COALESCE(dl.y, 0) - su.s"
        " AS BIGINT) AS dev\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM wr_r) sp\n"
        "  CROSS JOIN wr_s su\n"
        "  LEFT JOIN wr_d dl ON dl.u = su.u AND dl.d = sp.d),\n"
        "wr_m AS MATERIALIZED (\n"
        "  SELECT a.u, (SELECT n FROM wr_r) AS n_days,\n"
        "    CAST(sum(a.dev * a.dev) AS BIGINT) AS c0,\n"
        "    CAST(COALESCE(sum(a.dev * p.dev), 0) AS BIGINT) AS c7\n"
        f"  FROM wr_l a LEFT JOIN wr_l p ON p.u = a.u"
        f" AND p.d = a.d - {lag}\n"
        "  GROUP BY a.u)\n"
        "SELECT u AS user_id, n_days, c0, c7,\n"
        "  CAST((1000000 * c7) // c0 AS BIGINT) AS r7_micros\n"
        "FROM wr_m WHERE c0 > 0\n"
        f"ORDER BY r7_micros DESC, u ASC LIMIT {top_k}"
    )


def peel_layer_histogram_sql(k: int = 2, max_rounds: int = 64) -> str:
    """Mirror of algos.components.peel_layer_histogram: the kcore_sql
    unrolled peel; per-round removal counts as scalar differences,
    zero-removal rounds dropped, layer 0 = survivors."""
    parts = ["kc0 AS MATERIALIZED (SELECT id FROM vertices)"]
    for r in range(1, max_rounds + 1):
        prev = f"kc{r - 1}"
        parts.append(
            f"kc{r} AS MATERIALIZED (\n"
            f"  SELECT v.id FROM {prev} v JOIN (\n"
            f"    SELECT u.src, count(*) AS c FROM und u\n"
            f"    JOIN {prev} x ON x.id = u.src\n"
            f"    JOIN {prev} y ON y.id = u.dst\n"
            f"    GROUP BY u.src) d ON d.src = v.id AND d.c >= {k})"
        )
    joined = ",\n".join(parts)
    sels = [
        f"SELECT {r} AS layer,\n"
        f"  CAST((SELECT count(*) FROM kc{r - 1})"
        f" - (SELECT count(*) FROM kc{r}) AS BIGINT) AS n_vertices"
        for r in range(1, max_rounds + 1)
    ]
    sels.append(
        f"SELECT 0 AS layer,"
        f" CAST((SELECT count(*) FROM kc{max_rounds}) AS BIGINT)"
        " AS n_vertices"
    )
    union = "\nUNION ALL\n".join(sels)
    body = (
        f", {joined},\n"
        f"pl_all AS ({union})\n"
        "SELECT CAST(layer AS INT) AS layer, n_vertices\n"
        "FROM pl_all WHERE n_vertices > 0"
    )
    return _graph_query(body)


def value_shape_moments_sql(value_col: str = "value") -> str:
    """Mirror of operators.analytics.value_shape_moments: n-scaled
    deviation power sums on HUGEINT, identically-shaped skewness /
    kurtosis / Sarle floats rounded to micros."""
    return (
        "WITH sm_c AS MATERIALIZED (\n"
        f"  SELECT CAST(round({value_col} * 100) AS BIGINT) AS x"
        " FROM events),\n"
        "sm_b AS (SELECT CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(x) AS BIGINT) AS s FROM sm_c),\n"
        "sm_d AS MATERIALIZED (\n"
        "  SELECT b.n, CAST(b.n * c.x - b.s AS BIGINT) AS d\n"
        "  FROM sm_c c, sm_b b),\n"
        "sm_m AS (SELECT n,\n"
        "  sum(CAST(d AS HUGEINT) * d) AS m2,\n"
        "  sum(CAST(d AS HUGEINT) * d * d) AS m3,\n"
        "  sum(CAST(d AS HUGEINT) * d * (CAST(d AS HUGEINT) * d))"
        " AS m4\n"
        "  FROM sm_d GROUP BY n)\n"
        "SELECT n,\n"
        "  CAST(CASE WHEN m2 > 0 AND n > 3 THEN round(\n"
        "    CAST(m3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))\n"
        "    / pow(CAST(m2 AS DOUBLE), 1.5) * 1000000) END AS BIGINT)"
        " AS skew_micros,\n"
        "  CAST(CASE WHEN m2 > 0 AND n > 3 THEN round(\n"
        "    CAST(m4 AS DOUBLE) * CAST(n AS DOUBLE)\n"
        "    / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) * 1000000)"
        " END AS BIGINT) AS kurtosis_micros,\n"
        "  CAST(CASE WHEN m2 > 0 AND n > 3 THEN round(\n"
        "    (CAST(m3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))\n"
        "      / pow(CAST(m2 AS DOUBLE), 1.5)\n"
        "     * (CAST(m3 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))\n"
        "      / pow(CAST(m2 AS DOUBLE), 1.5)) + 1.0)\n"
        "    / (CAST(m4 AS DOUBLE) * CAST(n AS DOUBLE)\n"
        "      / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))\n"
        "      + 3.0 * CAST(n - 1 AS DOUBLE) * CAST(n - 1 AS DOUBLE)\n"
        "      / (CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE)))\n"
        "    * 1000000) END AS BIGINT) AS bimodality_micros\n"
        "FROM sm_m"
    )


def ljung_box_daily_sql(max_lag: int = 7) -> str:
    """Mirror of operators.analytics.ljung_box_daily: acf deviations,
    per-lag truncating HUGEINT micros terms, exact sum."""
    return (
        "WITH lb_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "lb_r AS (SELECT min(d) AS lo, max(d) AS hi,\n"
        "  CAST(sum(y) AS BIGINT) AS s,\n"
        "  CAST(max(d) - min(d) + 1 AS BIGINT) AS n FROM lb_d),\n"
        "lb_v AS MATERIALIZED (\n"
        "  SELECT sp.d,\n"
        "    CAST((SELECT n FROM lb_r) * COALESCE(dl.y, 0)\n"
        "      - (SELECT s FROM lb_r) AS BIGINT) AS dev\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM lb_r) sp\n"
        "  LEFT JOIN lb_d dl USING (d)),\n"
        "lb_0 AS (SELECT CAST(sum(dev * dev) AS BIGINT) AS c0"
        " FROM lb_v),\n"
        "lb_k AS MATERIALIZED (\n"
        "  SELECT t.lag, CAST(sum(a.dev * b.dev) AS BIGINT) AS ck\n"
        f"  FROM (SELECT unnest(range(1, {int(max_lag)} + 1)) AS lag)"
        " t\n"
        "  JOIN lb_v a ON TRUE\n"
        "  JOIN lb_v b ON b.d = a.d + t.lag\n"
        "  GROUP BY t.lag),\n"
        "lb_t AS (SELECT\n"
        "  CAST(CASE WHEN x.c0 > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT) * r.n * (r.n + 2)\n"
        "     * (CAST(k.ck AS HUGEINT) * k.ck))\n"
        "    // (CAST(r.n - k.lag AS HUGEINT)\n"
        "        * (CAST(x.c0 AS HUGEINT) * x.c0))\n"
        "  END AS BIGINT) AS term\n"
        "  FROM lb_k k, lb_0 x, lb_r r)\n"
        "SELECT (SELECT n FROM lb_r) AS n_days,\n"
        f"  CAST({int(max_lag)} AS INT) AS max_lag,\n"
        "  CAST(sum(term) AS BIGINT) AS q_micros\n"
        "FROM lb_t"
    )


def markov_order_test_sql() -> str:
    """Mirror of operators.analytics.markov_order_test: per-user
    ordered triple counts, triple-table marginals, per-cell
    micro-rounded G² terms, exact sum."""
    return (
        "WITH mo_s AS MATERIALIZED (\n"
        "  SELECT a, b, c FROM (\n"
        "    SELECT lag(event_type, 2) OVER wo AS a,\n"
        "      lag(event_type, 1) OVER wo AS b,\n"
        "      event_type AS c\n"
        "    FROM events WINDOW wo AS (PARTITION BY user_id\n"
        "      ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id))\n"
        "  WHERE a IS NOT NULL),\n"
        "mo_t AS MATERIALIZED (SELECT a, b, c,\n"
        "  CAST(count(*) AS BIGINT) AS nabc FROM mo_s GROUP BY 1, 2, 3),\n"
        "mo_ab AS MATERIALIZED (SELECT a, b,"
        " CAST(sum(nabc) AS BIGINT) AS nab FROM mo_t GROUP BY 1, 2),\n"
        "mo_bc AS MATERIALIZED (SELECT b, c,"
        " CAST(sum(nabc) AS BIGINT) AS nbc FROM mo_t GROUP BY 1, 2),\n"
        "mo_b AS MATERIALIZED (SELECT b,"
        " CAST(sum(nabc) AS BIGINT) AS nb FROM mo_t GROUP BY 1),\n"
        "mo_x AS (SELECT t.nabc,\n"
        "  CAST(round(2000000.0 * t.nabc * ln(\n"
        "    CAST(t.nabc * nb.nb AS DOUBLE)"
        " / CAST(ab.nab * bc.nbc AS DOUBLE)\n"
        "  )) AS BIGINT) AS term\n"
        "  FROM mo_t t JOIN mo_ab ab USING (a, b)\n"
        "  JOIN mo_bc bc USING (b, c) JOIN mo_b nb USING (b)),\n"
        "mo_c AS (SELECT CAST(count(*) AS BIGINT) AS n_contexts"
        " FROM mo_ab)\n"
        "SELECT CAST(sum(nabc) AS BIGINT) AS n_triples,\n"
        "  (SELECT n_contexts FROM mo_c) AS n_contexts,\n"
        "  CAST(sum(term) AS BIGINT) AS g2_micros\n"
        "FROM mo_x"
    )


def icc_user_value_sql(value_col: str = "value") -> str:
    """Mirror of operators.analytics.icc_user_value: per-user HUGEINT
    moments with the anova (s*s)//m truncation, identically-shaped
    ICC and DEFF floats rounded to micros."""
    ssb = (
        "CAST(sb AS DOUBLE)"
        " - CAST(st AS DOUBLE) * st / CAST(nn AS DOUBLE)"
    )
    ssw = "CAST(qt AS DOUBLE) - CAST(sb AS DOUBLE)"
    msb = f"(({ssb}) / (g - 1))"
    msw = f"(({ssw}) / (nn - g))"
    m0 = (
        "((CAST(nn AS DOUBLE) - CAST(msq AS DOUBLE) / nn)"
        " / (g - 1))"
    )
    icc = f"(({msb}) - ({msw})) / (({msb}) + ({m0} - 1.0) * ({msw}))"
    return (
        "WITH ic_p AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(count(*) AS BIGINT) AS m,\n"
        f"    CAST(sum(CAST(round({value_col} * 100) AS BIGINT))"
        " AS BIGINT) AS s,\n"
        f"    CAST(sum(CAST(round({value_col} * 100) AS BIGINT)\n"
        f"      * CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)"
        " AS q\n"
        "  FROM events GROUP BY 1),\n"
        "ic_t AS (SELECT CAST(count(*) AS BIGINT) AS g,\n"
        "  CAST(sum(m) AS BIGINT) AS nn,"
        " CAST(sum(s) AS BIGINT) AS st,\n"
        "  CAST(sum(q) AS BIGINT) AS qt,\n"
        "  sum(CAST(m AS HUGEINT) * m) AS msq,\n"
        "  sum((CAST(s AS HUGEINT) * s) // m) AS sb FROM ic_p)\n"
        "SELECT nn AS n_events, g AS n_users,\n"
        "  CAST(CASE WHEN g >= 2 AND nn > g THEN\n"
        f"    round(({icc}) * 1000000) END AS BIGINT) AS icc_micros,\n"
        "  CAST(CASE WHEN g >= 2 AND nn > g THEN\n"
        "    round((1.0 + (CAST(nn AS DOUBLE) / g - 1.0)"
        f" * ({icc})) * 1000000) END AS BIGINT) AS deff_micros\n"
        "FROM ic_t"
    )


def ams_f2_error_sql(
    key_col: str = "user_id", n_counters: int = 16, group_size: int = 4
) -> str:
    """Mirror of operators.sketches.ams_f2_error: hash-bit signed
    counters, truncating group means, lower-median rank rule,
    truncating micros error."""
    h = _h48("'ams:' || CAST(p.k AS VARCHAR)")
    n_groups = int(n_counters) // int(group_size)
    med = (n_groups + n_groups % 2) // 2
    return (
        "WITH am_p AS MATERIALIZED (\n"
        f"  SELECT {key_col} AS k, CAST(count(*) AS BIGINT) AS f\n"
        "  FROM events GROUP BY 1),\n"
        "am_f AS MATERIALIZED (\n"
        f"  SELECT t.j, CAST(p.f * (((({h}) >> CAST(t.j AS INT)) % 2)"
        " * 2 - 1) AS BIGINT) AS t\n"
        f"  FROM am_p p, (SELECT unnest(range(0, {int(n_counters)}))"
        " AS j) t),\n"
        "am_c AS MATERIALIZED (SELECT j,"
        " CAST(sum(t) AS BIGINT) AS c FROM am_f GROUP BY j),\n"
        "am_m AS MATERIALIZED (\n"
        f"  SELECT CAST(j // {int(group_size)} AS INT) AS grp,\n"
        f"    CAST(CAST(sum(c * c) AS BIGINT) // {int(group_size)}"
        " AS BIGINT) AS m\n"
        f"  FROM am_c GROUP BY 1),\n"
        "am_e AS (SELECT m AS est_f2 FROM (\n"
        "  SELECT m, grp, row_number() OVER (ORDER BY m ASC, grp ASC)"
        " AS rn FROM am_m)\n"
        f"  WHERE rn = {med}),\n"
        "am_x AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,\n"
        "  CAST(sum(f * f) AS BIGINT) AS exact_f2 FROM am_p)\n"
        "SELECT n_keys, exact_f2, est_f2,\n"
        "  CAST(CASE WHEN exact_f2 > 0 THEN\n"
        "    (1000000 * abs(est_f2 - exact_f2)) // exact_f2"
        " END AS BIGINT) AS err_micros\n"
        "FROM am_x, am_e"
    )


def session_gap_curve_sql(
    gaps_minutes: tuple = (5, 15, 30, 60)
) -> str:
    """Mirror of operators.sessions.session_gap_curve: one ordered
    gap table, per-threshold break counts, truncating mean length."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {int(g)} AS gap_minutes,\n"
        "  CAST((SELECT COALESCE(sum(CASE WHEN gap_us >"
        f" {int(g) * 60 * 1_000_000} THEN 1 ELSE 0 END), 0)"
        " FROM sg_g) AS BIGINT) AS n_breaks"
        for g in gaps_minutes
    )
    return (
        "WITH sg_g AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT)\n"
        "    - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (\n"
        "      PARTITION BY user_id ORDER BY CAST(epoch_us(ts)"
        " AS BIGINT), event_id) AS gap_us\n"
        "  FROM events),\n"
        "sg_t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)"
        " AS n_users,\n"
        "  CAST(count(*) AS BIGINT) AS n_events FROM events),\n"
        f"sg_w AS ({rows})\n"
        "SELECT CAST(w.gap_minutes AS INT) AS gap_minutes,"
        " t.n_users,\n"
        "  CAST(t.n_users + w.n_breaks AS BIGINT) AS n_sessions,\n"
        "  CAST((1000000 * t.n_events) // (t.n_users + w.n_breaks)"
        " AS BIGINT) AS avg_len_micros\n"
        "FROM sg_w w, sg_t t"
    )


def dedup_threshold_curve_sql(
    thresholds_permille: tuple = (500, 600, 700, 800, 900)
) -> str:
    """Mirror of operators.dedup.dedup_threshold_curve: the brute-force
    shared-token pair table (filterless, as jaccard_join_sql), one
    integer-thresholded count per cutoff."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {int(t)} AS threshold_permille,\n"
        "  CAST((SELECT COALESCE(sum(CASE WHEN inter * 1000 >="
        f" {int(t)} * union_sz THEN 1 ELSE 0 END), 0) FROM dtp)"
        " AS BIGINT) AS n_pairs"
        for t in thresholds_permille
    )
    return (
        f"WITH {TOKS_CTE},\n"
        "ts AS MATERIALIZED (SELECT doc_id AS doc, unnest(toks) AS tok\n"
        "  FROM (SELECT doc_id, list_distinct(toks) AS toks"
        " FROM toks_t)),\n"
        "sz AS MATERIALIZED (SELECT doc, CAST(count(*) AS BIGINT) AS n"
        " FROM ts GROUP BY doc),\n"
        "pr AS MATERIALIZED (\n"
        "  SELECT a.doc AS doc_a, b.doc AS doc_b,"
        " CAST(count(*) AS BIGINT) AS inter\n"
        "  FROM ts a JOIN ts b ON b.tok = a.tok AND a.doc < b.doc\n"
        "  GROUP BY a.doc, b.doc),\n"
        "dtp AS MATERIALIZED (\n"
        "  SELECT inter, CAST(sa.n + sb.n - inter AS BIGINT)"
        " AS union_sz\n"
        "  FROM pr JOIN sz sa ON sa.doc = doc_a"
        " JOIN sz sb ON sb.doc = doc_b)\n"
        f"{rows}"
    )


def anonymity_ladder_sql(small_k: int = 5) -> str:
    """Mirror of operators.profiling.anonymity_ladder: three nested
    QI groupBys, equal-width cents deciles, truncating small-class
    shares."""
    lv = []
    for lvl, desc, cols in (
        (1, "dow", "dow"),
        (2, "dow+type", "dow, t"),
        (3, "dow+type+vdec", "dow, t, vdec"),
    ):
        lv.append(
            f"SELECT {lvl} AS level, '{desc}' AS quasi_identifiers,\n"
            "  CAST(count(*) AS BIGINT) AS n_classes,\n"
            "  CAST(min(c) AS BIGINT) AS min_class_size,\n"
            "  CAST((1000000 * COALESCE(sum(CASE WHEN c <"
            f" {int(small_k)} THEN c ELSE 0 END), 0)) // sum(c)"
            " AS BIGINT) AS pct_small_micros\n"
            f"FROM (SELECT {cols}, CAST(count(*) AS BIGINT) AS c\n"
            f"  FROM al_s GROUP BY {cols})"
        )
        pass
    union = "\nUNION ALL\n".join(lv)
    return (
        "WITH al_m AS (SELECT"
        " CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
        " AS mc FROM events),\n"
        "al_s AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS dow,\n"
        "    event_type AS t,\n"
        "    CAST((CAST(round(value * 100) AS BIGINT) * 10)"
        " // ((SELECT mc FROM al_m) + 1) AS INT) AS vdec\n"
        "  FROM events)\n"
        f"{union}"
    )


def ucb1_channel_scores_sql(
    convert_type: str = "purchase", window_days: int = 1
) -> str:
    """Mirror of operators.analytics.ucb1_channel_scores: per-event
    first-conversion delays, arm rollups, truncating mean micros,
    identically-shaped UCB bonus float."""
    wus = int(window_days) * 86_400_000_000
    return (
        "WITH ub_f AS MATERIALIZED (\n"
        "  SELECT event_type AS arm, user_id AS u, event_id AS fid,\n"
        "    CAST(epoch_us(ts) AS BIGINT) AS ft FROM events\n"
        f"  WHERE event_type <> '{convert_type}'),\n"
        "ub_t AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS tt\n"
        f"  FROM events WHERE event_type = '{convert_type}'),\n"
        "ub_d AS MATERIALIZED (\n"
        "  SELECT f.fid, CAST(min(t.tt - f.ft) AS BIGINT) AS d\n"
        "  FROM ub_f f JOIN ub_t t ON t.u = f.u AND t.tt > f.ft\n"
        "  GROUP BY f.fid),\n"
        "ub_c AS MATERIALIZED (\n"
        "  SELECT f.arm,\n"
        "    CASE WHEN d.d IS NOT NULL AND d.d <="
        f" {wus} THEN 1 ELSE 0 END AS r\n"
        "  FROM ub_f f LEFT JOIN ub_d d ON d.fid = f.fid),\n"
        "ub_p AS MATERIALIZED (SELECT arm,"
        " CAST(count(*) AS BIGINT) AS n_trials,\n"
        "  CAST(sum(r) AS BIGINT) AS n_conversions FROM ub_c"
        " GROUP BY arm),\n"
        "ub_n AS (SELECT CAST(sum(n_trials) AS BIGINT) AS nt"
        " FROM ub_p)\n"
        "SELECT arm, n_trials, n_conversions,\n"
        "  CAST((1000000 * n_conversions) // n_trials AS BIGINT)"
        " AS mean_micros,\n"
        "  CAST((1000000 * n_conversions) // n_trials\n"
        "    + round(sqrt(2.0 * ln(CAST(nt AS DOUBLE))\n"
        "        / CAST(n_trials AS DOUBLE)) * 1000000) AS BIGINT)"
        " AS ucb_micros\n"
        "FROM ub_p, ub_n"
    )


def pages_trend_weekly_sql() -> str:
    """Mirror of operators.analytics.pages_trend_weekly: complete
    zero-filled calendar weeks, within-week doubled midranks,
    L2 = Σ (dow+1)·R2 and its exact null 224·n."""
    return (
        "WITH pg_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "pg_r AS (SELECT min(d) AS lo, max(d) AS hi FROM pg_d),\n"
        "pg_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y,\n"
        "    CAST((sp.d + 3) // 7 AS BIGINT) AS wk,\n"
        "    CAST((sp.d + 3) % 7 AS INT) AS dow\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM pg_r) sp\n"
        "  LEFT JOIN pg_d dl USING (d)),\n"
        "pg_w AS MATERIALIZED (SELECT wk FROM (\n"
        "  SELECT wk, count(*) AS nd FROM pg_f GROUP BY wk)\n"
        "  WHERE nd = 7),\n"
        "pg_c AS MATERIALIZED (\n"
        "  SELECT f.wk, f.dow, f.y FROM pg_f f"
        " JOIN pg_w w ON w.wk = f.wk),\n"
        "pg_g AS MATERIALIZED (SELECT wk, y,"
        " CAST(count(*) AS BIGINT) AS ct FROM pg_c GROUP BY 1, 2),\n"
        "pg_v AS MATERIALIZED (\n"
        "  SELECT wk, y, CAST(2 * COALESCE(sum(ct) OVER ("
        "PARTITION BY wk\n"
        "    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " 1 PRECEDING), 0) + ct + 1 AS BIGINT) AS r2\n"
        "  FROM pg_g),\n"
        "pg_k AS MATERIALIZED (\n"
        "  SELECT c.dow, CAST(sum(v.r2) AS BIGINT) AS r2d\n"
        "  FROM pg_c c JOIN pg_v v ON v.wk = c.wk AND v.y = c.y\n"
        "  GROUP BY c.dow),\n"
        "pg_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pg_w),\n"
        "pg_l AS (SELECT CAST(COALESCE(sum((dow + 1) * r2d), 0)"
        " AS BIGINT) AS l2 FROM pg_k)\n"
        "SELECT n AS n_weeks, CAST(7 AS INT) AS k_days, l2,\n"
        "  CAST(n * 224 AS BIGINT) AS e2_null\n"
        "FROM pg_n, pg_l"
    )


def seasonal_mann_kendall_sql(period: int = 7) -> str:
    """Mirror of operators.analytics.seasonal_mann_kendall:
    zero-filled spine, within-season ordered pairs, BIGINT sign
    sums."""
    return (
        "WITH sk_d AS MATERIALIZED (\n"
        "  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,\n"
        "    CAST(count(*) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1),\n"
        "sk_r AS (SELECT min(d) AS lo, max(d) AS hi FROM sk_d),\n"
        "sk_f AS MATERIALIZED (\n"
        "  SELECT sp.d, CAST(COALESCE(dl.y, 0) AS BIGINT) AS y,\n"
        f"    CAST((sp.d + 3) % {int(period)} AS INT) AS s\n"
        "  FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM sk_r) sp\n"
        "  LEFT JOIN sk_d dl USING (d)),\n"
        "sk_p AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,\n"
        "  CAST(COALESCE(sum(CAST(sign(b.y - a.y) AS BIGINT)), 0)"
        " AS BIGINT) AS s_total\n"
        "  FROM sk_f a JOIN sk_f b ON b.s = a.s AND b.d > a.d),\n"
        "sk_n AS (SELECT CAST(count(*) AS BIGINT) AS n_days"
        " FROM sk_f)\n"
        "SELECT n_days, n_pairs, s_total FROM sk_n, sk_p"
    )


def rmst_user_lifetime_sql(tau_days: int = 28) -> str:
    """Mirror of operators.analytics.rmst_user_lifetime: the full
    kaplan_meier_sql body nested as a CTE (a CTE body may open its
    own WITH — the curate_pack device), then the exact step-area sum
    with the last-step extension to τ."""
    tau = int(tau_days)
    return (
        f"WITH rm_km AS MATERIALIZED (\n{kaplan_meier_sql()}\n),\n"
        "rm_s AS MATERIALIZED (\n"
        "  SELECT duration_days, n_deaths, survival_micros,\n"
        "    CAST(COALESCE(lag(survival_micros) OVER (ORDER BY"
        " duration_days), 1000000) AS BIGINT) AS s_prev,\n"
        "    CAST(COALESCE(lag(duration_days) OVER (ORDER BY"
        " duration_days), 0) AS BIGINT) AS d_prev\n"
        f"  FROM rm_km WHERE duration_days <= {tau}),\n"
        "rm_a AS (SELECT\n"
        "  CAST(COALESCE(sum(n_deaths), 0) AS BIGINT)"
        " AS n_deaths_by_tau,\n"
        "  CAST(COALESCE(sum(s_prev * (duration_days - d_prev)), 0)"
        " AS BIGINT) AS a_before FROM rm_s),\n"
        "rm_l AS (SELECT survival_micros AS s_last,"
        " duration_days AS d_last\n"
        "  FROM rm_s ORDER BY duration_days DESC LIMIT 1)\n"
        f"SELECT CAST({tau} AS INT) AS tau_days, a.n_deaths_by_tau,\n"
        "  CAST(a.a_before + COALESCE(l.s_last, 1000000)\n"
        f"    * ({tau} - COALESCE(l.d_last, 0)) AS BIGINT)"
        " AS rmst_micro_days\n"
        "FROM rm_a a LEFT JOIN rm_l l ON TRUE"
    )


def mood_median_test_sql(
    group_col: str = "event_type", value_col: str = "value"
) -> str:
    """Mirror of operators.analytics.mood_median_test: lower-median
    rank rule, 2×k above/not-above cells with structural zeros, the
    HUGEINT (N·O − r·c)²/(N·r·c) micros terms, exact sum."""
    return (
        "WITH md_s AS MATERIALIZED (\n"
        f"  SELECT {group_col} AS g,"
        f" CAST(round({value_col} * 100) AS BIGINT) AS v"
        " FROM events),\n"
        "md_v AS MATERIALIZED (SELECT v,"
        " CAST(count(*) AS BIGINT) AS ct FROM md_s GROUP BY v),\n"
        "md_m AS (SELECT v AS med FROM (\n"
        "  SELECT v, ct, sum(ct) OVER (ORDER BY v) AS cum,\n"
        "    sum(ct) OVER () AS n FROM md_v)\n"
        "  WHERE cum >= (n + n % 2) // 2"
        " AND cum - ct < (n + n % 2) // 2),\n"
        "md_c AS MATERIALIZED (\n"
        "  SELECT g, CASE WHEN v > (SELECT med FROM md_m)"
        " THEN 1 ELSE 0 END AS hi,\n"
        "    CAST(count(*) AS BIGINT) AS o\n"
        "  FROM md_s GROUP BY 1, 2),\n"
        "md_r AS (SELECT g, CAST(sum(o) AS BIGINT) AS r FROM md_c"
        " GROUP BY g),\n"
        "md_k AS (SELECT hi, CAST(sum(o) AS BIGINT) AS c FROM md_c"
        " GROUP BY hi),\n"
        "md_n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM md_c),\n"
        "md_l AS MATERIALIZED (\n"
        "  SELECT COALESCE(x.o, 0) AS o, r.r, k.c,"
        " (SELECT n FROM md_n) AS n\n"
        "  FROM md_r r CROSS JOIN md_k k\n"
        "  LEFT JOIN md_c x ON x.g = r.g AND x.hi = k.hi),\n"
        "md_t AS (SELECT n,\n"
        "  CASE WHEN CAST(n AS HUGEINT) * r * c > 0 THEN\n"
        "    CAST((CAST(1000000 AS HUGEINT)\n"
        "      * ((CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)\n"
        "         * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)))\n"
        "      // (CAST(n AS HUGEINT) * r * c) AS BIGINT)\n"
        "  END AS t FROM md_l),\n"
        "md_g AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS k"
        " FROM md_c)\n"
        "SELECT n AS n_total, (SELECT k FROM md_g) AS k_groups,\n"
        "  CAST(sum(t) AS BIGINT) AS chi2_micros\n"
        "FROM md_t GROUP BY n"
    )


def lincoln_petersen_reach_sql() -> str:
    """Mirror of operators.analytics.lincoln_petersen_reach: exact
    midpoint halves, per-user capture flags, Chapman estimate and
    coverage with truncating divisions."""
    return (
        "WITH lp_s AS MATERIALIZED (\n"
        "  SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS t\n"
        "  FROM events),\n"
        "lp_r AS (SELECT min(t) AS lo, max(t) AS hi FROM lp_s),\n"
        "lp_p AS MATERIALIZED (\n"
        "  SELECT u,\n"
        "    max(CASE WHEN t <= (SELECT lo + (hi - lo) // 2 FROM lp_r)"
        " THEN 1 ELSE 0 END) AS a,\n"
        "    max(CASE WHEN t > (SELECT lo + (hi - lo) // 2 FROM lp_r)"
        " THEN 1 ELSE 0 END) AS b\n"
        "  FROM lp_s GROUP BY u),\n"
        "lp_a AS (SELECT CAST(sum(a) AS BIGINT) AS n_first,\n"
        "  CAST(sum(b) AS BIGINT) AS n_second,\n"
        "  CAST(sum(a * b) AS BIGINT) AS n_both,\n"
        "  CAST(count(*) AS BIGINT) AS n_seen FROM lp_p)\n"
        "SELECT n_first, n_second, n_both,\n"
        "  CAST(((n_first + 1) * (n_second + 1)) // (n_both + 1) - 1"
        " AS BIGINT) AS chapman_estimate,\n"
        "  CAST(CASE WHEN ((n_first + 1) * (n_second + 1))"
        " // (n_both + 1) - 1 > 0 THEN\n"
        "    (1000000 * n_seen) // (((n_first + 1) * (n_second + 1))"
        " // (n_both + 1) - 1)\n"
        "  END AS BIGINT) AS coverage_micros\n"
        "FROM lp_a"
    )


def cochran_armitage_trend_sql(positive_type: str = "purchase") -> str:
    """Mirror of operators.analytics.cochran_armitage_trend: dow
    scores, BIGINT moments, the cleared-denominator z² on HUGEINT."""
    return (
        "WITH ca_s AS MATERIALIZED (\n"
        "  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000"
        " + 3) % 7 AS INT) AS s,\n"
        f"    CASE WHEN event_type = '{positive_type}' THEN 1 ELSE 0"
        " END AS y\n"
        "  FROM events),\n"
        "ca_p AS MATERIALIZED (SELECT s,"
        " CAST(count(*) AS BIGINT) AS n,\n"
        "  CAST(sum(y) AS BIGINT) AS r FROM ca_s GROUP BY s),\n"
        "ca_m AS (SELECT CAST(sum(n) AS BIGINT) AS nn,\n"
        "  CAST(sum(r) AS BIGINT) AS rr,\n"
        "  CAST(sum(n * s) AS BIGINT) AS b,\n"
        "  CAST(sum(n * s * s) AS BIGINT) AS a,\n"
        "  CAST(sum(s * r) AS BIGINT) AS sr FROM ca_p)\n"
        "SELECT nn AS n_total, rr AS n_positive,\n"
        "  CAST(nn * sr - b * rr AS BIGINT) AS t_num,\n"
        "  CAST(CASE WHEN CAST(rr AS HUGEINT) * (nn - rr)\n"
        "      * (CAST(nn AS HUGEINT) * a - CAST(b AS HUGEINT) * b)"
        " > 0 THEN\n"
        "    (CAST(1000000 AS HUGEINT)\n"
        "     * (CAST(nn AS HUGEINT) * sr - CAST(b AS HUGEINT) * rr)\n"
        "     * (CAST(nn AS HUGEINT) * sr - CAST(b AS HUGEINT) * rr)\n"
        "     * nn)\n"
        "    // (CAST(rr AS HUGEINT) * (nn - rr)\n"
        "        * (CAST(nn AS HUGEINT) * a - CAST(b AS HUGEINT) * b))\n"
        "  END AS BIGINT) AS z2_micros\n"
        "FROM ca_m"
    )
