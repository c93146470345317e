"""Pure-Python reference simulators (test oracles).

``simulate_pagerank`` implements *exactly* the semantics of
GraphLite-0.20/example/PageRankVertex.cc:145-172 plus the engine's
delivery/termination rules (engine/Node.cc:56-88, engine/Master.cc:429-431)
— written independently, per-vertex and loop-based, so it is an oracle for
the DataFrame engine rather than a re-statement of it.

Other oracles: union-find connected components, brute-force LPA, O(V·d^2)
triangle counting.
"""

from __future__ import annotations

from collections import defaultdict


def simulate_pagerank(edges, n, eps=1e-6, max_supersteps=200, fixed=None):
    """Returns (values list, supersteps executed)."""
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    val = [0.0] * n
    active = [True] * n
    inbox = defaultdict(float)  # delivered (combined) messages for this ss
    global_delta = 0.0  # aggregator global seen during the current ss
    ss_done = 0
    for ss in range(max_supersteps if fixed is None else fixed):
        # delivery: a message reactivates (Node.cc:56-62)
        for v in inbox:
            active[v] = True
        local_delta = 0.0
        outbox = defaultdict(float)
        sent = 0
        for v in range(n):
            if not active[v]:
                continue
            # --- compute() ---
            if ss == 0:
                newval = 1.0
            else:
                if fixed is None and ss >= 2 and global_delta < eps:
                    active[v] = False  # voteToHalt(); return
                    continue
                s = inbox.get(v, 0.0)
                newval = 0.15 + 0.85 * s
                local_delta += abs(val[v] - newval)
            val[v] = newval
            for d in out.get(v, ()):
                outbox[d] += newval / len(out[v])
                sent += 1
        inbox = outbox
        global_delta = local_delta  # master merge, broadcast next ss
        ss_done = ss + 1
        act = sum(active)
        if act == 0 and sent == 0:
            break
    return val, ss_done


def undirected_adj(edges, n):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def simulate_components(edges, n):
    """Union-find; component = min id in the set."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return [find(v) for v in range(n)]


def simulate_lpa(edges, n, iterations=5):
    """Synchronous LPA: most-frequent neighbor label, min tie-break."""
    adj = undirected_adj(edges, n)
    labels = list(range(n))
    for _ in range(iterations):
        new = list(labels)
        for v in range(n):
            neigh = adj.get(v)
            if not neigh:
                continue
            counts = defaultdict(int)
            for u in neigh:
                counts[labels[u]] += 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def simulate_triangles(edges, n):
    """Per-vertex triangle counts + total; brute force over lo<mid<hi."""
    adj = undirected_adj(edges, n)
    per = [0] * n
    total = 0
    for a in range(n):
        na = sorted(u for u in adj.get(a, ()) if u > a)
        for i, b in enumerate(na):
            for c in na[i + 1:]:
                if c in adj[b]:
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
                    total += 1
    return per, total


def random_digraph(n, m, seed=7, allow_dangling=True):
    """Seeded random simple digraph (no self-loops); may include vertices
    with no out-edges (they must still hold rank — Worker.cc:342-355)."""
    import random

    rng = random.Random(seed)
    seen = set()
    edges = []
    max_src = n if allow_dangling else n
    while len(edges) < m:
        s = rng.randrange(0, max(1, int(n * 0.8)) if allow_dangling else n)
        d = rng.randrange(n)
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d))
    return edges
