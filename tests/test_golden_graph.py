"""Independent numpy golden cross-checks for the graph family.

Why this exists (VERDICT r6 item 1): every oracle-parity pair in this
repo is same-author — a formula error shared by the Spark op and its
DuckDB oracle is invisible to the parity gate, and the r6 sparse-grid
episode (three live bugs behind green parity) proved that bites hardest
in multi-step iterative code. These tests rebuild each graph statistic
a THIRD way: the raw nation-trade edge list is pulled straight from the
parquet with one DuckDB join (the SPEC the op documents — shared), then
every algorithm runs as textbook numpy adjacency-matrix math (power
iteration, boolean-closure components, matrix-product wedge counts —
NOT shared with either engine's SQL/DataFrame formulation).

Both scale factors run: at sf0.01 the %13 trade graph is COMPLETE
(every degree 24 — the degenerate corner where jaccard/clustering
collapse to 1 and ties are everywhere), while sf0.001 has degrees
6..23, so formula terms that a complete graph zeroes out (degree
variance, non-trivial wedges, missing links) are actually exercised.

Conventions follow tests/test_golden_stats.py: op outputs come through
the registry (the driver's entry point) and are compared field-by-field
to the op's own rounding.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from transit_scrape_spark.queries.registry import registry

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
N = 25  # nations


@pytest.fixture(scope="module", params=SFS, ids=["sf0.001", "sf0.01"])
def sf(request):
    return request.param


@pytest.fixture(scope="module")
def ops(spark, sf):
    reg = registry()
    cache: dict[str, list[dict]] = {}

    def run(op_id):
        if op_id not in cache:
            cache[op_id] = [
                r.asDict() for r in reg[op_id].fn(spark, sf).collect()
            ]
        return cache[op_id]

    return run


def _edges_df(sf: str, modulus: int):
    con = duckdb.connect()
    for t in ("nation", "customer", "supplier", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    df = con.execute(
        f"""
        SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS a,
                        CAST(s.s_nationkey AS BIGINT) AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE l.l_partkey % {modulus} = 0 AND c.c_nationkey <> s.s_nationkey
        """
    ).df()
    regions = con.execute(
        "SELECT CAST(n_nationkey AS BIGINT) AS node,"
        " CAST(n_regionkey AS BIGINT) AS comm FROM nation"
    ).df()
    con.close()
    return df, regions


@pytest.fixture(scope="module")
def G(sf):
    """(A, directed, regions): symmetric 25x25 adjacency, the raw
    directed edge array, and the nation->region map for the %13 graph."""
    df, regions = _edges_df(sf, 13)
    directed = df.to_numpy(int)
    A = np.zeros((N, N), int)
    for a, b in directed:
        A[a, b] = 1
        A[b, a] = 1
    comm = dict(zip(regions.node, regions.comm))
    return A, directed, comm


@pytest.fixture(scope="module")
def G_sparse(sf):
    """Symmetric adjacency of the %211 (sparse) variant used by
    graph-assortativity."""
    df, _ = _edges_df(sf, 211)
    A = np.zeros((N, N), int)
    for a, b in df.to_numpy(int):
        A[a, b] = 1
        A[b, a] = 1
    return A


def close(got, want, tol=1e-4):
    assert got == pytest.approx(want, rel=tol, abs=tol), (got, want)


# ---------------------------------------------------------------------------
# components / traversal


def test_components(ops, G):
    A, _, _ = G
    R = (A + np.eye(N, dtype=int)) > 0
    for _ in range(6):  # closure doubles reach per step; diameter << 2^6
        R = R | (R.astype(int) @ R.astype(int) > 0)
    want = {i: int(np.flatnonzero(R[i]).min()) for i in range(N)}
    rows = {r["node"]: r["component"] for r in ops("graph-components-iterative")}
    assert rows == want


def _bfs(A, src, max_d):
    dist = {src: 0}
    frontier = [src]
    for d in range(1, max_d + 1):
        nxt = []
        for u in frontier:
            for v in np.flatnonzero(A[u]):
                if int(v) not in dist:
                    dist[int(v)] = d
                    nxt.append(int(v))
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_distance(ops, G):
    A, _, _ = G
    want = _bfs(A, 0, 6)
    rows = {r["node"]: r["dist"] for r in ops("graph-bfs-distance")}
    assert rows == want


def test_closeness_centrality(ops, G):
    A, _, _ = G
    rows = {r["src"]: r for r in ops("graph-closeness-centrality")}
    for s in range(5):
        dist = _bfs(A, s, 6)
        reached = len(dist) - 1
        sum_d = sum(dist.values())
        r = rows[s]
        assert r["n_reached"] == reached
        assert r["sum_dist"] == sum_d
        close(r["closeness"], reached / sum_d)
        close(r["harmonic"], sum(1.0 / d for d in dist.values() if d > 0))


def test_label_propagation(ops, G):
    A, _, _ = G
    nodes = np.flatnonzero(A.sum(1) > 0)
    l1 = {
        int(u): min(int(u), int(np.flatnonzero(A[u]).min())) for u in nodes
    }
    l2 = {
        int(u): min(
            l1[int(u)], min(l1[int(v)] for v in np.flatnonzero(A[u]))
        )
        for u in nodes
    }
    want: dict[int, int] = {}
    for lab in l2.values():
        want[lab] = want.get(lab, 0) + 1
    rows = {r["label"]: r["n_nodes"] for r in ops("graph-label-propagation")}
    assert rows == want


# ---------------------------------------------------------------------------
# spectral / centrality iterations


def test_pagerank(ops, G):
    A, _, _ = G
    r = np.full(N, 1.0 / N)
    deg = A.sum(1)
    for _ in range(5):
        contrib = np.zeros(N)
        for a in range(N):
            if deg[a]:
                contrib += A[a] * (r[a] / deg[a])
        r = 0.15 / N + 0.85 * contrib
    rows = {x["node"]: x["pagerank"] for x in ops("graph-pagerank")}
    assert set(rows) == set(range(N))
    for n in range(N):
        close(rows[n], r[n], tol=1e-5)


def test_hits_scores(ops, G):
    A, _, _ = G
    nodes = np.flatnonzero(A.sum(1) > 0)
    a1 = A.sum(0).astype(float)  # in-degree (h0 = 1)
    h1 = A.sum(1).astype(float)  # out-degree (a0 = 1)
    a2 = A.T @ h1
    h2 = A @ a1
    rows = {r["node"]: r for r in ops("graph-hits-scores")}
    assert set(rows) == {int(u) for u in nodes}
    for u in nodes:
        close(rows[int(u)]["authority"], a2[u] / a2[nodes].max())
        close(rows[int(u)]["hub"], h2[u] / h2[nodes].max())


def test_spectral_radius(ops, G):
    A, _, _ = G
    nodes = np.flatnonzero(A.sum(1) > 0)
    v = np.zeros(N)
    v[nodes] = 1.0
    vs = [v]
    for _ in range(4):
        vs.append(A.T @ vs[-1])
    (row,) = ops("graph-spectral-radius")
    assert row["n_nodes"] == len(nodes)
    close(
        row["spectral_radius_est"],
        np.linalg.norm(vs[4]) / np.linalg.norm(vs[3]),
    )


# ---------------------------------------------------------------------------
# degree structure


def test_degree_histogram(ops, G):
    A, _, _ = G
    deg = A.sum(1)
    want: dict[int, int] = {}
    for d in deg[deg > 0]:
        want[int(d)] = want.get(int(d), 0) + 1
    rows = {r["degree"]: r["n_nodes"] for r in ops("graph-degree-histogram")}
    assert rows == want


def test_assortativity(ops, G_sparse):
    A = G_sparse
    deg = A.sum(1)
    xs, ys = [], []
    for a in range(N):
        for b in np.flatnonzero(A[a]):
            xs.append(float(deg[a]))
            ys.append(float(deg[b]))
    x, y = np.array(xs), np.array(ys)
    (row,) = ops("graph-assortativity")
    assert row["n_directed_edges"] == len(x)
    close(row["avg_endpoint_degree"], x.mean(), tol=1e-3)
    denom = math.sqrt(x.var() * y.var())
    want = ((x * y).mean() - x.mean() * y.mean()) / denom if denom else None
    if want is None:
        assert row["assortativity"] is None
    else:
        close(row["assortativity"], want)


def test_rich_club(ops, G):
    A, _, _ = G
    deg = A.sum(1)
    rows = {r["k"]: r for r in ops("graph-rich-club")}
    seen = set()
    for k in range(1, 9):
        rich = np.flatnonzero(deg > k)
        nk = len(rich)
        if nk < 2:
            continue
        seen.add(k)
        e2 = int(A[np.ix_(rich, rich)].sum())
        r = rows[k]
        assert r["n_rich"] == nk
        assert r["rich_edges"] == e2 // 2
        close(r["rich_club_coeff"], e2 / (nk * (nk - 1)))
    assert set(rows) == seen


def test_reciprocity(ops, G):
    _, directed, _ = G
    pairs = {(int(a), int(b)) for a, b in directed}
    n_rec = sum((b, a) in pairs for a, b in pairs)
    (row,) = ops("graph-reciprocity")
    assert row["n_edges"] == len(pairs)
    assert row["n_reciprocal"] == n_rec
    close(row["reciprocity"], n_rec / len(pairs))


# ---------------------------------------------------------------------------
# triangles / wedges


def test_triangle_count(ops, G):
    A, _, _ = G
    want = int(np.trace(np.linalg.matrix_power(A, 3))) // 6
    (row,) = ops("graph-triangle-count")
    assert row["n_triangles"] == want


def test_clustering_coeff(ops, G):
    A, _, _ = G
    deg = A.sum(1)
    tri_mat = (A @ A) * A  # per (u,v): common neighbors on an edge
    rows = {r["node"]: r for r in ops("graph-clustering-coeff")}
    assert set(rows) == {int(u) for u in np.flatnonzero(deg > 0)}
    for u in np.flatnonzero(deg > 0):
        t = int(tri_mat[u].sum()) // 2  # triangles through u
        r = rows[int(u)]
        assert r["degree"] == int(deg[u])
        assert r["triangles"] == t
        want = 2.0 * t / (deg[u] * (deg[u] - 1)) if deg[u] >= 2 else 0.0
        close(r["clustering_coeff"], want)


def test_ktruss_support(ops, G):
    A, _, _ = G
    common = A @ A
    scored = [
        (int(common[a, b]), int(a), int(b))
        for a in range(N)
        for b in range(a + 1, N)
        if A[a, b]
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = scored[:25]
    got = [
        (r["n_triangles"], r["a"], r["b"], r["in_4truss"])
        for r in ops("graph-ktruss-support")
    ]
    assert [(t, a, b, t >= 2) for t, a, b in want] == got


def test_k_core(ops, G):
    A, _, _ = G
    E = A.copy()
    for _ in range(3):  # bounded peel, k=3: matches the op's fixed rounds
        deg = E.sum(1)
        alive = deg >= 3
        E = E * np.outer(alive, alive)
    deg = E.sum(1)
    want = {int(u): int(deg[u]) for u in np.flatnonzero(deg >= 3)}
    rows = {r["node"]: r["core_degree"] for r in ops("graph-k-core")}
    assert rows == want


# ---------------------------------------------------------------------------
# neighborhood similarity / link prediction


def test_jaccard_neighbors(ops, G):
    A, _, _ = G
    deg = A.sum(1)
    common = A @ A
    want = {}
    for u in range(N):
        for v in range(u + 1, N):
            c = int(common[u, v])
            if c == 0:
                continue
            j = c / (deg[u] + deg[v] - c)
            if j >= 0.5:
                want[(u, v)] = (c, j)
    rows = {(r["u"], r["v"]): r for r in ops("graph-jaccard-neighbors")}
    assert set(rows) == set(want)
    for k, (c, j) in want.items():
        assert rows[k]["n_common"] == c
        close(rows[k]["jaccard"], j)


def test_adamic_adar(ops, G):
    A, _, _ = G
    deg = A.sum(1)
    want = {}
    for u in range(N):
        for v in range(u + 1, N):
            ws = np.flatnonzero(A[u] & A[v])
            ws = [w for w in ws if deg[w] > 1]
            if not ws:
                continue
            aa = sum(1.0 / math.log(deg[w]) for w in ws)
            if aa >= 1.0:
                want[(u, v)] = (len(ws), aa, bool(A[u, v]))
    rows = {(r["u"], r["v"]): r for r in ops("graph-adamic-adar")}
    assert set(rows) == set(want)
    for k, (c, aa, is_edge) in want.items():
        assert rows[k]["n_common"] == c
        close(rows[k]["aa_score"], aa)
        assert rows[k]["is_edge"] == is_edge


def test_two_hop_neighbors(ops, G):
    A, _, _ = G
    reach2 = (A @ A) > 0
    deg = A.sum(1)
    rows = {r["node"]: r for r in ops("graph-two-hop-neighbors")}
    assert set(rows) == {int(u) for u in np.flatnonzero(deg > 0)}
    for u in np.flatnonzero(deg > 0):
        strict = sum(
            1
            for v in range(N)
            if v != u and reach2[u, v] and not A[u, v]
        )
        assert rows[int(u)]["n_direct"] == int(deg[u])
        assert rows[int(u)]["n_exactly_two_hops"] == strict


def test_jaccard_link_prediction(ops, G):
    A, _, _ = G
    deg = A.sum(1).astype(float)
    common = A @ A
    cands = []
    for u in range(N):
        for v in range(u + 1, N):
            if A[u, v] or common[u, v] == 0:
                continue
            c = float(common[u, v])
            j = round(c / (deg[u] + deg[v] - c), 6)
            cands.append((j, u, v, int(c)))
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cands[:10]
    got = ops("graph-jaccard-link-prediction")
    assert len(got) == len(want)
    for r, (j, u, v, c) in zip(got, want):
        assert (r["node_a"], r["node_b"], r["common_neighbors"]) == (u, v, c)
        close(r["jaccard"], j)


# ---------------------------------------------------------------------------
# partition quality


def test_modularity(ops, G):
    A, _, comm = G
    labeled = [
        (comm[a], comm[b])
        for a in range(N)
        for b in np.flatnonzero(A[a])
    ]
    m2 = float(len(labeled))
    per: dict[int, list[float]] = {}
    for ca, cb in labeled:
        e_in, tot = per.setdefault(ca, [0.0, 0.0])
        per[ca] = [e_in + (ca == cb), tot + 1]
    q = sum(e / m2 - (t / m2) ** 2 for e, t in per.values())
    (row,) = ops("graph-modularity")
    assert row["n_communities"] == len(per)
    close(row["modularity_q"], q)
