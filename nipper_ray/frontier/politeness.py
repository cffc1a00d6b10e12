"""Per-host politeness, robots filtering and priority selection.

Crawl-ordering rule (deterministic, documented for parity tests —
FIXTURES.md §4): within a host, candidates are ordered by
(priority desc, url asc) and at most ``per_host_budget`` are taken per
wave (a wave-budget token count, NOT a wall-clock timer, so parity runs
are reproducible — SURVEY.md §7 hard parts). The global wave is then
ordered by (priority desc, url asc) and capped at ``wave_budget``.

Skew handling: the politeness group-by is salted — top-B is computed per
(host, salt) subgroup first, then re-reduced per host. Top-B of the
union of per-salt top-Bs equals the exact per-host top-B, so the hot
host's work fans out over SALT_N tasks without changing semantics.

Robots: the sandbox has no network, so robots.txt is a deterministic
synthetic file per host (each host disallows the ``/doc/<digit>``
prefix derived from xxh64(host) % 10 — see frontier/robots.py); the
*plumbing* is real — the robots file is fetched+parsed once per host
and memoized in actor/worker state (RobotsCache), exactly where an
HTTP robots fetch would go.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SALT_N = 8


class RobotsFilterStage:
    """map_batches stage: drop robots-disallowed URLs. The fetched+
    parsed robots rules are cached per actor/worker lifetime in
    RobotsCache (frontier/robots.py) — exactly where a production HTTP
    robots fetch would go."""

    def __init__(self, url_col: str = "url"):
        from .robots import RobotsCache

        self.cache = RobotsCache()
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(batch) == 0:
            return batch
        # one vectorized regex pass extracts host + path for canonical
        # URLs; only rows the regex can't split (no path, exotic
        # schemes) fall back to per-row urlsplit
        parts = pc.extract_regex(
            batch.column(self.url_col),
            r"^[a-z][a-z0-9+.\-]*://(?P<h>[^/?#]+)(?P<p>/[^?#]*)?")
        hosts = pc.struct_field(parts, "h").to_pylist()
        paths = pc.struct_field(parts, "p").to_pylist()
        urls = batch.column(self.url_col).to_pylist()
        for i, h in enumerate(hosts):
            if h is None:
                from urllib.parse import urlsplit

                sp = urlsplit(urls[i])
                hosts[i] = (sp.hostname or "").lower()
                paths[i] = sp.path
            else:
                # canonical URLs are already lowercase; strip port +
                # userinfo the way urlsplit.hostname does (rare)
                if "@" in h:
                    h = h.rsplit("@", 1)[1]
                if h.startswith("["):  # IPv6 literal
                    h = h[1:h.index("]")] if "]" in h else h[1:]
                elif ":" in h:
                    h = h.split(":", 1)[0]
                hosts[i] = h.lower()
                if paths[i] is None:
                    paths[i] = ""
        # rules matching is grouped by host and vectorized: one
        # fetch+parse per NEW host (cached), then per-host longest-
        # match over that host's paths via pc.starts_with — no
        # per-row Python in the match loop
        cache = self.cache
        n = len(batch)
        hosts_np = np.asarray(hosts, dtype=object)
        uniq, inv = np.unique(hosts_np, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        path_arr = pa.array(paths, pa.string())
        mask = np.ones(n, dtype=bool)
        delays = np.zeros(n, dtype=np.float64)
        for k, h in enumerate(uniq):
            idx = order[bounds[k]:bounds[k + 1]]
            rr = cache.rules_for(h)
            if rr.rules:
                sub = path_arr.take(pa.array(idx, pa.int64()))
                best_len = np.full(len(idx), -1, dtype=np.int64)
                best_allow = np.ones(len(idx), dtype=bool)
                for prefix, is_allow in rr.rules:
                    m = pc.starts_with(sub, pattern=prefix).to_numpy(
                        zero_copy_only=False)
                    ln = len(prefix)
                    upd = m & ((ln > best_len)
                               | ((ln == best_len) & is_allow))
                    best_len[upd] = ln
                    best_allow[upd] = is_allow
                mask[idx] = best_allow
            if rr.crawl_delay:
                delays[idx] = rr.crawl_delay
        out = batch.filter(pa.array(mask))
        # surfaced for the politeness stage: Crawl-delay becomes a
        # deterministic per-wave token cap (see select_wave)
        return out.append_column(
            "crawl_delay_s", pa.array(delays[mask], pa.float64()))


def add_salt(batch: pa.Table, num_salts: int = SALT_N) -> pa.Table:
    h = batch.column("url_hash").to_numpy(zero_copy_only=False)
    salt = ((h >> np.uint64(32)) % np.uint64(num_salts)).astype(np.int32)
    return batch.append_column("salt", pa.array(salt, pa.int32()))


def top_b_per_group(budget: int, wave_period_s: float = 300.0):
    """map_groups fn: deterministic (priority desc, url asc) head-B.

    A robots ``Crawl-delay`` (surfaced by RobotsFilterStage as the
    ``crawl_delay_s`` column) tightens the host's cap to the number of
    polite requests that fit one wave period: min(B, wave_period/d) —
    a wall-clock-free token model, so parity runs stay reproducible."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        eff = budget
        if "crawl_delay_s" in g.columns and len(g):
            d = float(g["crawl_delay_s"].iloc[0])
            if d > 0:
                eff = min(budget, max(1, int(wave_period_s // d)))
        g = g.sort_values(["priority", "url"],
                          ascending=[False, True], kind="mergesort")
        return g.head(eff)

    return fn


def add_group_pkey(batch: pa.Table, n_parts: int,
                   with_salt: bool) -> pa.Table:
    """Hash-partition column for the politeness groupbys: all rows of
    one (host[, salt]) group land in one of ``n_parts`` partitions, so
    the groupby dispatches O(n_parts) ``map_groups`` calls instead of
    one per host (millions at 10^10-URL scale — the same executor-
    dispatch hazard as LSH banding, same fix).  The salted phase keys
    the hash on (host, salt) so a hot host still fans out over
    partitions."""
    # url_hash is xxh64(url); a host-stable hash must come from the
    # host string itself
    from .hashing import xxh64_batch

    hh = xxh64_batch(batch.column("host").to_pylist())
    if with_salt:
        salt = batch.column("salt").to_numpy(zero_copy_only=False)
        hh = hh ^ (salt.astype(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15))
    pkey = ((hh >> np.uint64(33)) % np.uint64(n_parts)).astype(np.int32)
    return batch.append_column("pkey", pa.array(pkey))


def top_b_per_partition(budget: int, by, wave_period_s: float = 300.0,
                        partition_cap=None):
    """map_groups fn over one pkey partition: the exact per-``by``
    top-B of every group routed here, vectorized — one stable sort +
    groupby.cumcount against the per-host Crawl-delay-capped budget
    (identical semantics to ``top_b_per_group``, O(n_parts) dispatches
    total).  ``partition_cap`` additionally truncates the partition's
    output to its (priority desc, url asc) head — sound whenever the
    global selection takes at most that many rows, since one partition
    can contribute no more than the global cap."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["priority", "url"],
                          ascending=[False, True], kind="mergesort")
        eff = np.full(len(g), budget, dtype=np.int64)
        if "crawl_delay_s" in g.columns and len(g):
            d = g.groupby(list(by), sort=False)["crawl_delay_s"] \
                 .transform("first").to_numpy()
            capped = d > 0
            eff[capped] = np.minimum(
                budget,
                np.maximum(1, (wave_period_s // d[capped])
                           .astype(np.int64)))
        keep = g.groupby(list(by), sort=False).cumcount().to_numpy() < eff
        out = g[keep]
        if partition_cap is not None:
            out = out.head(partition_cap)  # still (prio desc, url) sorted
        return out

    return fn


def select_wave(frontier_ds, per_host_budget: int, wave_budget: int,
                num_salts: int = SALT_N, salted: bool = True,
                wave_period_s: float = 300.0):
    """Politeness + priority selection over a deduped frontier Dataset.

    Groupby shuffle(s) + a tournament global top-K; all ordering keys
    are deterministic (no wall clock). With ``salted`` (the default,
    for hot-host skew) the per-host top-B is computed in two phases —
    per (host, salt) then per host — which is exactly equal to the
    single-phase top-B (top-B of a union of per-salt top-Bs) but fans a
    hot host's work over ``num_salts`` tasks. ``salted=False`` skips the
    extra shuffle for small frontiers; results are identical.

    The global wave cap is applied to PRE-CAPPED candidates: each
    per-host-top-B partition truncates itself to its own (priority
    desc, url asc) head-``wave_budget`` first (a partition cannot
    contribute more to the global head), so the final sort+limit
    ranges over at most n_parts x wave_budget rows — O(wave output) —
    instead of the whole frontier.  Equal output (priority/url is a
    total order — urls are deduped), and the sorted result stays
    multi-block, keeping the downstream fetch/extract stages parallel
    (a single-group reduce was measured to collapse them to one
    task)."""
    n_parts = 64
    if salted:
        ds = frontier_ds.map_batches(
            lambda t: add_group_pkey(add_salt(t, num_salts), n_parts,
                                     with_salt=True),
            batch_format="pyarrow")
        ds = ds.groupby("pkey").map_groups(
            top_b_per_partition(per_host_budget, ("host", "salt"),
                                wave_period_s),
            batch_format="pandas")
        ds = ds.drop_columns(["salt", "pkey"])
    else:
        ds = frontier_ds
    ds = ds.map_batches(
        lambda t: add_group_pkey(t, n_parts, with_salt=False),
        batch_format="pyarrow")
    ds = ds.groupby("pkey").map_groups(
        top_b_per_partition(per_host_budget, ("host",), wave_period_s,
                            partition_cap=wave_budget),
        batch_format="pandas")
    ds = ds.drop_columns(["pkey"])
    ds = ds.sort(["priority", "url"], descending=[True, False])
    return ds.limit(wave_budget)
