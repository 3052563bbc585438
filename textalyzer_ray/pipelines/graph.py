"""Distributed triangle counting (graph clustering structure).

``triangle_counts`` is the degree-ordered edge-orientation algorithm
(Cohen 2009 / Suri & Vassilvitskii 2011, the MapReduce-classic): orient
every undirected edge from its lower-(degree, name) endpoint to the
higher one — a DAG whose max out-degree is O(sqrt(m)) — then each
node's out-neighbor PAIRS (wedges) are matched against the oriented
edge set; every triangle {x, y, z} with rank x < y < z is found exactly
once, as the wedge (y, z) at apex x. Output: (node, n_tri) — the
per-node triangle participation counts (numerator of the local
clustering coefficient).

Scale shape: dedup/degree/wedge/match are all key-aligned exchanges
sized to the MEASURED edge count; wedge generation is a per-block
polars self-join (out-degree bound makes per-apex work O(sqrt(m))²
= O(m) worst-case per block); the wedge-edge match is a union-tag
grouped semi-join — never acero, so sparse partitions are harmless.
Degree attachment auto-switches on the measured node count: broadcast
the (node, deg) table below ``broadcast_threshold`` (zero extra
shuffle), else two ``union_tag_lookup`` exchanges.

``word_graph_triangles`` applies it to the word co-occurrence graph
(adjacent-bigram edges with corpus count >= min_count — the TextRank
word network), the text-native graph this corpus actually has
(the synthetic host link graph is a star: zero triangles by
construction).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _node_field(edges: Dataset, a_col: str) -> pa.DataType:
    from textalyzer_ray.stages.groups import id_type_of

    return id_type_of(edges, a_col)


def triangle_counts(
    edges: Dataset,
    a_col: str = "a",
    b_col: str = "b",
    broadcast_threshold: int = 2_000_000,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """(node, n_tri) over the undirected simple graph induced by the
    (a_col, b_col) edge list: self-loops dropped, parallel/reversed
    duplicates collapsed. Sorted by node.

    Measured-size switch (the connected_components pattern): at or
    below ``small_threshold`` distinct edges the whole orient/wedge/
    match runs in ONE remote task over the deduped edge block refs —
    four hash exchanges cost seconds of fixed operator-actor startup
    that dwarf small-graph compute (measured: the sf0.1 word graph is
    30 nodes yet paid 2.2 s). Edges never touch the driver either way;
    cross-path equality is pytest-pinned."""
    import numpy as np  # noqa: F401  (polars backs onto numpy kernels)

    node_t = _node_field(edges, a_col)
    und_schema = pa.schema([pa.field("a", node_t), pa.field("b", node_t)])

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return und_schema.empty_table()
        df = (
            pl.from_arrow(t.select([a_col, b_col]))
            .select(
                pl.min_horizontal(a_col, b_col).alias("a"),
                pl.max_horizontal(a_col, b_col).alias("b"),
            )
            .filter(pl.col("a") != pl.col("b"))
        )
        return df.to_arrow().cast(und_schema)

    from textalyzer_ray.stages.groups import key_counts, partitions_for

    dist = (
        key_counts(
            edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
            ["a", "b"],
        )
        .map_batches(
            lambda t: t.select(["a", "b"]).cast(und_schema),
            batch_format="pyarrow",
        )
        .materialize()  # consumed by degrees + attach
    )
    m = dist.count()
    out_schema = pa.schema(
        [pa.field("node", node_t), pa.field("n_tri", pa.int64())]
    )
    if m == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())
    if m <= small_threshold:
        return _triangles_one_task(dist, out_schema)
    parts = partitions_for(m)

    node_schema = pa.schema([pa.field("node", node_t)])

    def endpoints(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        nodes = pl.concat(
            [
                df.select(pl.col("a").alias("node")),
                df.select(pl.col("b").alias("node")),
            ]
        )
        return nodes.to_arrow().cast(node_schema)

    degrees = key_counts(
        dist.map_batches(endpoints, batch_format="pyarrow"), ["node"]
    ).map_batches(
        lambda t: pa.table(
            {"node": pc.cast(t["node"], node_t), "deg": t["count"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_nodes = degrees.count()

    if n_nodes <= broadcast_threshold:
        withdeg = _attach_deg_broadcast(dist, degrees, node_t)
    else:
        withdeg = _attach_deg_distributed(dist, degrees, node_t, parts)

    orient_schema = pa.schema(
        [
            pa.field("u", node_t),
            pa.field("v", node_t),
            pa.field("dv", pa.int64()),
        ]
    )

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return orient_schema.empty_table()
        df = pl.from_arrow(t)
        swap = (pl.col("db") < pl.col("da")) | (
            (pl.col("db") == pl.col("da")) & (pl.col("b") < pl.col("a"))
        )
        out = df.select(
            pl.when(swap).then(pl.col("b")).otherwise(pl.col("a")).alias("u"),
            pl.when(swap).then(pl.col("a")).otherwise(pl.col("b")).alias("v"),
            pl.when(swap).then(pl.col("da")).otherwise(pl.col("db")).alias("dv"),
        )
        return out.to_arrow().cast(orient_schema)

    oriented = withdeg.map_batches(orient, batch_format="pyarrow")

    # union-tag schema shared by wedges and edges for the match stage
    tag_schema = pa.schema(
        [
            pa.field("x", node_t),
            pa.field("y", node_t),
            pa.field("apex", node_t),
            pa.field("side", pa.int8()),
        ]
    )

    from textalyzer_ray.stages.groups import grouped_apply

    def wedge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tag_schema.empty_table()
        df = pl.from_arrow(t)
        j = df.join(df, on="u", suffix="_r")
        j = j.filter(
            (pl.col("dv") < pl.col("dv_r"))
            | ((pl.col("dv") == pl.col("dv_r")) & (pl.col("v") < pl.col("v_r")))
        )
        out = j.select(
            pl.col("v").alias("x"),
            pl.col("v_r").alias("y"),
            pl.col("u").alias("apex"),
            pl.lit(1, dtype=pl.Int8).alias("side"),
        )
        return out.to_arrow().cast(tag_schema)

    wedges = grouped_apply(oriented, ["u"], wedge_block, parts)

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "x": pc.cast(t["u"], node_t),
                "y": pc.cast(t["v"], node_t),
                "apex": pa.nulls(n, node_t),
                "side": pa.array([0] * n, pa.int8()),
            },
            schema=tag_schema,
        )

    # oriented is re-executed here (cheap lineage off materialized dist)
    edge_tags = oriented.map_batches(tag_edges, batch_format="pyarrow")

    part_schema = pa.schema(
        [pa.field("node", node_t), pa.field("n", pa.int64())]
    )

    def match_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        df = pl.from_arrow(t)
        e = df.filter(pl.col("side") == 0).select(["x", "y"])
        w = df.filter(pl.col("side") == 1)
        tri = w.join(e, on=["x", "y"], how="semi")
        if tri.height == 0:
            return part_schema.empty_table()
        nodes = pl.concat(
            [
                tri.select(pl.col("apex").alias("node")),
                tri.select(pl.col("x").alias("node")),
                tri.select(pl.col("y").alias("node")),
            ]
        )
        out = nodes.group_by("node").agg(pl.len().cast(pl.Int64).alias("n"))
        return out.to_arrow().cast(part_schema)

    partials = grouped_apply(
        wedges.union(edge_tags), ["x", "y"], match_block, parts
    )
    return (
        key_counts(partials, ["node"], sum_cols=["n"])
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t["node"], node_t),
                    "n_tri": t["sum_n"],
                },
                schema=out_schema,
            ),
            batch_format="pyarrow",
        )
        .sort("node")
    )


def _triangles_one_task(dist: Dataset, out_schema: pa.Schema) -> Dataset:
    """Whole algorithm in one remote task over the deduped edge block
    refs: same degree orientation + wedge self-join + edge semi-join,
    single-process polars. Result returns via from_arrow_refs — edges
    and counts never touch the driver."""
    import ray
    import ray.data as rd

    @ray.remote
    def tri_task(*blocks: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.concat_tables(blocks))
        deg = pl.concat(
            [
                df.select(pl.col("a").alias("node")),
                df.select(pl.col("b").alias("node")),
            ]
        ).group_by("node").agg(pl.len().cast(pl.Int64).alias("deg"))
        e = (
            df.join(deg.rename({"node": "a", "deg": "da"}), on="a")
            .join(deg.rename({"node": "b", "deg": "db"}), on="b")
        )
        swap = (pl.col("db") < pl.col("da")) | (
            (pl.col("db") == pl.col("da")) & (pl.col("b") < pl.col("a"))
        )
        o = e.select(
            pl.when(swap).then(pl.col("b")).otherwise(pl.col("a")).alias("u"),
            pl.when(swap).then(pl.col("a")).otherwise(pl.col("b")).alias("v"),
            pl.when(swap).then(pl.col("da")).otherwise(pl.col("db")).alias("dv"),
        )
        w = o.join(o, on="u", suffix="_r").filter(
            (pl.col("dv") < pl.col("dv_r"))
            | ((pl.col("dv") == pl.col("dv_r")) & (pl.col("v") < pl.col("v_r")))
        )
        tri = w.join(
            o.select(pl.col("u").alias("v"), pl.col("v").alias("v_r")),
            on=["v", "v_r"],
            how="semi",
        )
        if tri.height == 0:
            return out_schema.empty_table()
        nodes = pl.concat(
            [
                tri.select(pl.col("u").alias("node")),
                tri.select(pl.col("v").alias("node")),
                tri.select(pl.col("v_r").alias("node")),
            ]
        )
        out = (
            nodes.group_by("node")
            .agg(pl.len().cast(pl.Int64).alias("n_tri"))
            .sort("node")
        )
        return out.to_arrow().cast(out_schema)

    ref = tri_task.remote(*dist.to_arrow_refs())
    return rd.from_arrow_refs([ref]).sort("node")


def _attach_deg_broadcast(
    dist: Dataset, degrees: Dataset, node_t: pa.DataType
) -> Dataset:
    import ray

    deg_ref = ray.put(pa.concat_tables(ray.get(degrees.to_arrow_refs())))

    def annotate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [
                    pa.field("a", node_t),
                    pa.field("b", node_t),
                    pa.field("da", pa.int64()),
                    pa.field("db", pa.int64()),
                ]
            ).empty_table()
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        ck = deg_ref.hex()
        dm = cache.get(ck)
        if dm is None:
            dm = cache[ck] = pl.from_arrow(ray.get(deg_ref))
        df = (
            pl.from_arrow(t)
            .join(dm.rename({"node": "a", "deg": "da"}), on="a", how="inner")
            .join(dm.rename({"node": "b", "deg": "db"}), on="b", how="inner")
        )
        return df.to_arrow()

    return dist.map_batches(annotate, batch_format="pyarrow")


def _attach_deg_distributed(
    dist: Dataset, degrees: Dataset, node_t: pa.DataType, parts: int
) -> Dataset:
    from textalyzer_ray.pipelines.joins import union_tag_lookup

    da = union_tag_lookup(
        dist,
        degrees.map_batches(
            lambda t: pa.table({"a": t["node"], "deg": t["deg"]}),
            batch_format="pyarrow",
        ),
        "a",
        "deg",
        "da",
        parts,
    )
    return union_tag_lookup(
        da,
        degrees.map_batches(
            lambda t: pa.table({"b": t["node"], "deg": t["deg"]}),
            batch_format="pyarrow",
        ),
        "b",
        "deg",
        "db",
        parts,
    )


def word_cooccurrence_edges(
    ds_docs: Dataset, min_count: int = 5, text_col: str = "text"
) -> Dataset:
    """(a, b) word-graph edges: adjacent-token bigrams with corpus
    count >= min_count (direction kept here; triangle_counts
    undirects)."""
    counts = word_cooccurrence_counts(ds_docs, text_col)

    def keep(t: pa.Table) -> pa.Table:
        k = t.filter(pc.greater_equal(t["n"], min_count))
        return pa.table({"a": k["a"], "b": k["b"]}).cast(
            pa.schema([pa.field("a", pa.string()), pa.field("b", pa.string())])
        )

    return counts.map_batches(keep, batch_format="pyarrow")


def word_graph_triangles(
    ds_docs: Dataset,
    min_count: int = 5,
    text_col: str = "text",
    broadcast_threshold: int = 2_000_000,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """(node, n_tri) over the bigram word graph — which words sit in
    tightly clustered collocation neighborhoods."""
    return triangle_counts(
        word_cooccurrence_edges(ds_docs, min_count, text_col),
        "a",
        "b",
        broadcast_threshold,
        small_threshold,
    )


def symmetric_word_edges(
    ds_docs: Dataset, min_count: int = 5, text_col: str = "text"
) -> Dataset:
    """(a, b, w) symmetrized bigram edges: for every unordered word
    pair {a, b}, a != b, w = count(a->b) + count(b->a), kept when
    w >= min_count and emitted in BOTH directions (the undirected
    TextRank graph as a directed edge list). Self-loops dropped."""
    from textalyzer_ray.stages.groups import key_counts

    directed = word_cooccurrence_counts(ds_docs, text_col)

    und_schema = pa.schema(
        [
            pa.field("a", pa.string()),
            pa.field("b", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def to_unordered(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return und_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .filter(pl.col("a") != pl.col("b"))
            .select(
                pl.min_horizontal("a", "b").alias("a"),
                pl.max_horizontal("a", "b").alias("b"),
                pl.col("n"),
            )
        )
        return df.to_arrow().cast(und_schema)

    und = key_counts(
        directed.map_batches(to_unordered, batch_format="pyarrow"),
        ["a", "b"],
        sum_cols=["n"],
    )

    out_schema = pa.schema(
        [
            pa.field("a", pa.string()),
            pa.field("b", pa.string()),
            pa.field("w", pa.int64()),
        ]
    )

    def both_ways(t: pa.Table) -> pa.Table:
        k = t.filter(pc.greater_equal(t["sum_n"], min_count))
        if k.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(k.select(["a", "b", "sum_n"]))
        fwd = df.select(
            pl.col("a"), pl.col("b"), pl.col("sum_n").alias("w")
        )
        rev = df.select(
            pl.col("b").alias("a"), pl.col("a").alias("b"),
            pl.col("sum_n").alias("w"),
        )
        return pl.concat([fwd, rev]).to_arrow().cast(out_schema)

    return und.map_batches(both_ways, batch_format="pyarrow")


def word_cooccurrence_counts(
    ds_docs: Dataset, text_col: str = "text"
) -> Dataset:
    """(a, b, n) directed adjacent-bigram counts (the edge-weight
    input of symmetric_word_edges; word_cooccurrence_edges keeps only
    the thresholded keys)."""
    from textalyzer_ray.stages.groups import key_counts
    from textalyzer_ray.stages.tokenize import _flat_tokens

    pair_schema = pa.schema(
        [
            pa.field("a", pa.string()),
            pa.field("b", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        tokens, parents = _flat_tokens(t, text_col)
        if len(tokens) == 0:
            return pair_schema.empty_table()
        df = (
            pl.from_arrow(pa.table({"doc": parents, "a": tokens}))
            .with_columns(pl.col("a").shift(-1).over("doc").alias("b"))
            .drop_nulls("b")
            .group_by(["a", "b"])
            .len()
            .select("a", "b", pl.col("len").cast(pl.Int64).alias("n"))
        )
        return df.to_arrow().cast(pair_schema)

    merged = key_counts(
        ds_docs.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["a", "b"],
        sum_cols=["n"],
    )
    return merged.map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "n": t["sum_n"]}
        ).cast(pair_schema),
        batch_format="pyarrow",
    )


def textrank_keywords(
    ds_docs: Dataset,
    min_count: int = 5,
    damping: float = 0.85,
    n_iter: int = 10,
    text_col: str = "text",
    seeds: list[str] | None = None,
) -> Dataset:
    """TextRank keyword scoring (Mihalcea & Tarau 2004): weighted
    PageRank over the symmetrized bigram word graph -> (word, pr,
    pr_rank) by (pr desc, word). Composes symmetric_word_edges with
    the existing host_pagerank operator (identical float-op order, so
    the measured cross-engine parity of the PageRank chain carries
    over). ``seeds`` switches to the topic-sensitive variant
    (restart/dangling mass to the seed words only — the TrustRank
    restart, links.host_pagerank(seeds=...)): scores rank words by
    graph proximity to the seed topic instead of global centrality."""
    from textalyzer_ray.pipelines.links import host_pagerank

    edges = symmetric_word_edges(ds_docs, min_count, text_col).map_batches(
        lambda t: pa.table(
            {
                "src_host": t["a"],
                "dst_host": t["b"],
                "n_links": t["w"],
            }
        ),
        batch_format="pyarrow",
    )
    pr = host_pagerank(edges, damping=damping, n_iter=n_iter, seeds=seeds)
    return pr.map_batches(
        # rebuild by NAME (host -> word), not positionally, so a column
        # reorder in host_pagerank can never silently mislabel output
        lambda t: pa.table(
            {"word": t["host"], "pr": t["pr"], "pr_rank": t["pr_rank"]}
        ),
        batch_format="pyarrow",
    ).sort("pr_rank")


def kcore_decompose(
    edges: Dataset,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 8,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """The k-CORE of the undirected simple graph induced by the edge
    list (Seidman 1983): iteratively remove every node with degree < k
    until fixpoint; return the surviving (node, deg) rows (deg = the
    node's degree INSIDE the core), sorted by node. Raises if the peel
    has not converged after ``max_rounds`` (the SQL oracle unrolls the
    same fixed round count; extra rounds past the fixpoint are no-ops,
    so equality holds whenever the impl converges).

    Measured-size switch (the triangle_counts pattern): small graphs
    peel in ONE remote task over the deduped edge block refs; larger
    graphs run the distributed loop — per round, one degree exchange
    (both-endpoint key_counts) and an alive-set broadcast filter (the
    alive set is node-sized, orders below the edge volume)."""
    import numpy as np

    import ray
    import ray.data as rd

    node_t = _node_field(edges, a_col)
    und_schema = pa.schema([pa.field("a", node_t), pa.field("b", node_t)])

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return und_schema.empty_table()
        df = (
            pl.from_arrow(t.select([a_col, b_col]))
            .select(
                pl.min_horizontal(a_col, b_col).alias("a"),
                pl.max_horizontal(a_col, b_col).alias("b"),
            )
            .filter(pl.col("a") != pl.col("b"))
        )
        return df.to_arrow().cast(und_schema)

    from textalyzer_ray.stages.groups import key_counts

    dist = (
        key_counts(
            edges.map_batches(
                norm, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["a", "b"],
        )
        .map_batches(
            lambda t: t.select(["a", "b"]).cast(und_schema),
            batch_format="pyarrow",
        )
        .materialize()
    )
    m = dist.count()
    out_schema = pa.schema(
        [pa.field("node", node_t), pa.field("deg", pa.int64())]
    )
    if m == 0:
        return rd.from_arrow(out_schema.empty_table())

    if m <= small_threshold:
        @ray.remote
        def peel_task(*blocks: pa.Table) -> pa.Table:
            t = pa.concat_tables(blocks)
            df = pl.from_arrow(t)
            for _ in range(max_rounds):
                degs = (
                    pl.concat(
                        [
                            df.select(pl.col("a").alias("node")),
                            df.select(pl.col("b").alias("node")),
                        ]
                    )
                    .group_by("node")
                    .len()
                )
                alive = degs.filter(pl.col("len") >= k)["node"]
                nxt = df.filter(
                    pl.col("a").is_in(alive) & pl.col("b").is_in(alive)
                )
                if nxt.height == df.height:
                    out = (
                        degs.filter(pl.col("len") >= k)
                        .select(
                            pl.col("node"),
                            pl.col("len").cast(pl.Int64).alias("deg"),
                        )
                        .sort("node")
                    )
                    return out.to_arrow().cast(out_schema)
                df = nxt
            raise RuntimeError(
                f"k-core peel not converged in {max_rounds} rounds"
            )

        refs = dist.to_arrow_refs()
        return rd.from_arrow_refs([peel_task.remote(*refs)]).sort("node")

    # distributed loop: degree exchange + alive broadcast filter
    cur = dist
    prev_edges = m
    for _ in range(max_rounds):
        both = cur.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t["a"].combine_chunks().cast(node_t),
                            t["b"].combine_chunks().cast(node_t),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        degs = key_counts(both, ["node"]).materialize()
        alive_t = degs.map_batches(
            lambda t: t.filter(pc.greater_equal(t["count"], k)).select(
                ["node"]
            ),
            batch_format="pyarrow",
        ).materialize()
        alive_chunks = [
            b["node"].combine_chunks()
            for b in alive_t.iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
        alive_arr = (
            pa.concat_arrays(alive_chunks)
            if alive_chunks
            else pa.array([], node_t)
        )
        aref = ray.put(alive_arr)

        def keep_edges(t: pa.Table) -> pa.Table:
            from textalyzer_ray.stages.groups import _worker_object_cache

            cache = _worker_object_cache()
            s = cache.get(aref.hex())
            if s is None:
                s = cache[aref.hex()] = pl.Series(
                    "alive", ray.get(aref)
                )
            df = pl.from_arrow(t)
            return (
                df.filter(
                    pl.col("a").is_in(s) & pl.col("b").is_in(s)
                )
                .to_arrow()
                .cast(und_schema)
            )

        cur = cur.map_batches(
            keep_edges, batch_format="pyarrow"
        ).materialize()
        n_edges = cur.count()
        if n_edges == prev_edges:
            final_degs = key_counts(
                cur.map_batches(
                    lambda t: pa.table(
                        {
                            "node": pa.concat_arrays(
                                [
                                    t["a"].combine_chunks().cast(node_t),
                                    t["b"].combine_chunks().cast(node_t),
                                ]
                            )
                        }
                    ),
                    batch_format="pyarrow",
                ),
                ["node"],
            )
            return final_degs.map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "deg": t["count"]},
                    schema=out_schema,
                ),
                batch_format="pyarrow",
            ).sort("node")
        prev_edges = n_edges
    raise RuntimeError(f"k-core peel not converged in {max_rounds} rounds")


def word_kcore(
    ds_docs: Dataset,
    k: int = 4,
    min_count: int = 5,
    text_col: str = "text",
    max_rounds: int = 8,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """k-core of the bigram word graph (same edge set as
    word_graph_triangles): the words in densely interlinked
    collocation neighborhoods -> (node, deg) sorted."""
    return kcore_decompose(
        word_cooccurrence_edges(ds_docs, min_count, text_col),
        k,
        max_rounds=max_rounds,
        small_threshold=small_threshold,
    )


def label_propagation(
    edges: Dataset,
    n_iter: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Synchronous weighted label propagation (community detection,
    Raghavan-Albert-Kumara 2007) made DETERMINISTIC: every node starts
    labeled with its own id; each round, every node simultaneously
    adopts the label with the largest incident weight sum, ties broken
    by smallest label. The graph is undirected (each input row votes
    both ways, parallel edge weights sum, self-loops dropped) and every
    node gets a UNIT SELF-LOOP — the self-vote that removes the
    bipartite oscillation of pure synchronous LPA (noted in the
    original paper) while keeping the update one vectorized rule.
    All weights are integers, so the oracle is exact (no float margin).

    -> (node, community) after exactly ``n_iter`` rounds, sorted by
    node. Measured-size switch (the kcore/triangles pattern): below
    ``small_threshold`` symmetrized edges the whole loop runs in ONE
    remote polars task over the edge block refs (an iterative Dataset
    loop pays shuffle-actor startup every round — CLAUDE.md); larger
    graphs run per round ONE union-tag label lookup by vote source +
    ONE key-aligned argmax exchange, both sized to the measured edge
    count.
    """
    import numpy as np
    import ray
    import ray.data as rd

    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    node_t = _node_field(edges, src_col)
    sym_schema = pa.schema(
        [
            pa.field("s", node_t),
            pa.field("t", node_t),
            pa.field("w", pa.int64()),
        ]
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sym_schema.empty_table()
        df = pl.from_arrow(t.select([src_col, dst_col, w_col])).filter(
            pl.col(src_col) != pl.col(dst_col)
        )
        fwd = df.select(
            pl.col(src_col).alias("s"),
            pl.col(dst_col).alias("t"),
            pl.col(w_col).cast(pl.Int64).alias("w"),
        )
        rev = df.select(
            pl.col(dst_col).alias("s"),
            pl.col(src_col).alias("t"),
            pl.col(w_col).cast(pl.Int64).alias("w"),
        )
        return pl.concat([fwd, rev]).to_arrow().cast(sym_schema)

    sym = (
        key_counts(
            edges.map_batches(
                both_dirs, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["s", "t"],
            sum_cols=["w"],
        )
        .map_batches(
            lambda t: pa.table(
                {"s": t["s"], "t": t["t"], "w": t["sum_w"]}, schema=sym_schema
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    m = sym.count()
    out_schema = pa.schema(
        [pa.field("node", node_t), pa.field("community", node_t)]
    )
    if m == 0:
        return rd.from_arrow(out_schema.empty_table())

    def lpa_rounds(df: "pl.DataFrame") -> "pl.DataFrame":
        """The whole sync-LPA loop over a polars (s, t, w) frame —
        shared verbatim by the one-task path and the brute-force tests."""
        aug = pl.concat(
            [
                df,
                df.select(pl.col("s"))
                .unique()
                .with_columns(
                    pl.col("s").alias("t"), pl.lit(1).cast(pl.Int64).alias("w")
                ),
            ]
        )
        lab = (
            aug.select(pl.col("s").alias("node"))
            .unique()
            .with_columns(pl.col("node").alias("lab"))
        )
        for _ in range(n_iter):
            votes = (
                aug.join(
                    lab.rename({"node": "t"}), on="t", how="inner"
                )
                .group_by(["s", "lab"])
                .agg(pl.col("w").sum().alias("wv"))
            )
            lab = (
                votes.sort(
                    ["s", "wv", "lab"], descending=[False, True, False]
                )
                .group_by("s", maintain_order=True)
                .first()
                .select(pl.col("s").alias("node"), pl.col("lab"))
            )
        return lab.sort("node")

    if m <= small_threshold:

        @ray.remote
        def lpa_task(*blocks: pa.Table) -> pa.Table:
            df = pl.concat([pl.from_arrow(b) for b in blocks])
            lab = lpa_rounds(df)
            return lab.rename({"lab": "community"}).to_arrow().cast(out_schema)

        refs = sym.to_arrow_refs()
        return rd.from_arrow_refs([lpa_task.remote(*refs)])

    # ---- distributed rounds (edge-count-sized exchanges) ----
    n_parts = partitions_for(m)
    # unit self-loops become ordinary edges so the self-vote rides the
    # same label lookup as every neighbor vote
    def add_self(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        nodes = pc_.unique(t["s"].combine_chunks())
        self_t = pa.table(
            {
                "s": nodes,
                "t": nodes,
                "w": pa.array(
                    np.ones(len(nodes), np.int64), pa.int64()
                ),
            },
            schema=sym_schema,
        )
        return pa.concat_tables([t.cast(sym_schema), self_t])

    # s is hash-aligned after key_counts' grouped merge only in the
    # distributed branch; re-align explicitly so per-block unique(s)
    # is globally unique
    aug = grouped_apply(sym, ["s"], add_self, num_partitions=n_parts)
    aug = aug.materialize()

    lab_schema = pa.schema(
        [pa.field("node", node_t), pa.field("lab", node_t)]
    )

    def init_labels(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        nodes = pc_.unique(t["s"].combine_chunks())
        return pa.table({"node": nodes, "lab": nodes}, schema=lab_schema)

    lab_ds = grouped_apply(
        sym.select_columns(["s"]), ["s"], init_labels, num_partitions=n_parts
    )

    def argmax_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return lab_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["s", "lab"])
            .agg(pl.col("w").sum().alias("wv"))
            .sort(["s", "wv", "lab"], descending=[False, True, False])
            .group_by("s", maintain_order=True)
            .first()
            .select(pl.col("s").alias("node"), pl.col("lab"))
            .to_arrow()
            .cast(lab_schema)
        )

    for _ in range(n_iter):
        looked = union_tag_lookup(
            aug,
            lab_ds.map_batches(
                lambda t: pa.table({"t": t["node"], "lab_v": t["lab"]}),
                batch_format="pyarrow",
            ),
            key_col="t",
            value_col="lab_v",
            out_col="lab",
            num_partitions=n_parts,
        )
        lab_ds = grouped_apply(
            looked.select_columns(["s", "lab", "w"]),
            ["s"],
            argmax_block,
            num_partitions=n_parts,
        ).materialize()

    return lab_ds.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "community": t["lab"]}, schema=out_schema
        ),
        batch_format="pyarrow",
    ).sort("node")


def hop_distance(
    edges: Dataset,
    seeds: Dataset,
    n_rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Multi-source BFS over the DIRECTED edge list: (node, dist) for
    every node reachable from the seed set within ``n_rounds`` hops,
    dist = minimum hop count (seeds at 0), unreached nodes omitted —
    the semantic-neighborhood expansion step (seed docs -> kNN-graph
    closure) a decontamination or topic-harvest pass runs before
    filtering. Exactly ``n_rounds`` rounds, so a SQL oracle unrolls the
    same chain as MATERIALIZED CTEs (integer-only output; the edge set
    itself carries any float-margin certification, e.g. knn_graph's
    measured 1.4e-6 adjacent-cosine gap).

    Measured-size switch (the kcore/LPA/triangles pattern): below
    ``small_threshold`` edges the whole BFS runs in ONE remote numpy
    task over the edge block refs (an iterative Dataset loop pays
    shuffle-actor startup every round — CLAUDE.md); larger graphs run
    per round ONE union-tag frontier lookup keyed by ``src_col`` plus
    ONE key-aligned min-dist merge keyed by node, both sized to the
    measured edge count. The merge re-ships the known dist table each
    round (node-sized, orders below the edge volume)."""
    import numpy as np
    import ray
    import ray.data as rd

    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    node_t = _node_field(edges, src_col)
    out_schema = pa.schema(
        [pa.field(node_col, node_t), pa.field("dist", pa.int64())]
    )
    edge_schema = pa.schema(
        [pa.field("src", node_t), pa.field("dst", node_t)]
    )

    def norm_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t[src_col], "dst": t[dst_col]}, schema=edge_schema
        )

    es = edges.map_batches(
        norm_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    m = es.count()

    seed_schema = pa.schema([pa.field(node_col, node_t)])

    def norm_seeds(t: pa.Table) -> pa.Table:
        return t.select([node_col]).cast(seed_schema)

    sd = seeds.map_batches(norm_seeds, batch_format="pyarrow").materialize()
    if m <= small_threshold:

        @ray.remote
        def bfs_task(n_seed_blocks: int, *blocks: pa.Table) -> pa.Table:
            seed_nodes = np.unique(
                np.concatenate(
                    [
                        b[node_col].to_numpy(zero_copy_only=False)
                        for b in blocks[:n_seed_blocks]
                    ]
                    or [np.empty(0, np.int64)]
                )
            )
            eb = blocks[n_seed_blocks:]
            src = np.concatenate(
                [b["src"].to_numpy(zero_copy_only=False) for b in eb]
                or [np.empty(0, np.int64)]
            )
            dst = np.concatenate(
                [b["dst"].to_numpy(zero_copy_only=False) for b in eb]
                or [np.empty(0, np.int64)]
            )
            order = np.argsort(src, kind="stable")
            S, D = src[order], dst[order]
            known = seed_nodes
            dists = np.zeros(len(known), dtype=np.int64)
            frontier = seed_nodes
            for k in range(1, n_rounds + 1):
                if len(frontier) == 0:
                    break
                lo = np.searchsorted(S, frontier, side="left")
                hi = np.searchsorted(S, frontier, side="right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if tot == 0:
                    break
                starts = np.repeat(lo, cnt)
                within = np.arange(tot) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt
                )
                neigh = np.unique(D[starts + within])
                new = neigh[~np.isin(neigh, known)]
                known = np.concatenate([known, new])
                dists = np.concatenate(
                    [dists, np.full(len(new), k, dtype=np.int64)]
                )
                frontier = new
            o = np.argsort(known, kind="stable")
            return pa.table(
                {
                    node_col: pa.array(known[o]).cast(node_t),
                    "dist": pa.array(dists[o], pa.int64()),
                },
                schema=out_schema,
            )

        seed_refs = sd.to_arrow_refs()
        edge_refs = es.to_arrow_refs()
        return rd.from_arrow_refs(
            [bfs_task.remote(len(seed_refs), *seed_refs, *edge_refs)]
        )

    # ---- distributed rounds (edge-count-sized exchanges) ----
    n_parts = partitions_for(m)
    dist_schema = pa.schema(
        [pa.field(node_col, node_t), pa.field("dist", pa.int64())]
    )

    def seed_dist(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: t[node_col],
                "dist": pa.array(
                    np.zeros(t.num_rows, np.int64), pa.int64()
                ),
            },
            schema=dist_schema,
        )

    dist_ds = sd.map_batches(seed_dist, batch_format="pyarrow").materialize()

    def min_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return dist_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(node_col)
            .agg(pl.col("dist").min())
            .to_arrow()
            .cast(dist_schema)
        )

    for k in range(1, n_rounds + 1):
        frontier = dist_ds.map_batches(
            lambda t, _k=k: t.filter(
                pc.equal(t["dist"], _k - 1)
            ).select([node_col]),
            batch_format="pyarrow",
        )
        reached = union_tag_lookup(
            es,
            frontier.map_batches(
                lambda t: pa.table(
                    {"src": t[node_col], "one": pa.array([1] * t.num_rows, pa.int64())},
                ),
                batch_format="pyarrow",
            ),
            key_col="src",
            value_col="one",
            out_col="__hit",
            num_partitions=n_parts,
        )
        cand = reached.map_batches(
            lambda t, _k=k: pa.table(
                {
                    node_col: t["dst"],
                    "dist": pa.array(
                        np.full(t.num_rows, _k, np.int64), pa.int64()
                    ),
                },
                schema=dist_schema,
            ),
            batch_format="pyarrow",
        )
        dist_ds = grouped_apply(
            dist_ds.union(cand),
            [node_col],
            min_block,
            num_partitions=n_parts,
        ).materialize()

    return dist_ds.sort(node_col)


def common_neighbors(
    edges: Dataset,
    a_col: str = "a",
    b_col: str = "b",
    min_cn: int = 2,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Common-neighbors link prediction (Liben-Nowell & Kleinberg 2003,
    the integer core of the Adamic-Adar family): over the undirected
    simple graph of (a_col, b_col) — self-loops dropped, duplicates
    collapsed — return every NON-adjacent unordered pair (id_a < id_b)
    sharing at least ``min_cn`` neighbors, with the exact shared count.
    The missing-edge candidates a crawl's site-graph enrichment ranks.

    Scale shape (the triangle_counts machinery re-aimed): one distinct
    exchange on (a, b); wedge pairs are emitted per APEX block by a
    polars self-join (one key-aligned exchange on the apex); adjacency
    removal costs ZERO extra shuffles — edge rows union-tag into the
    same (a, b)-keyed exchange that merges wedge counts, so a pair is
    dropped in-block when any side=0 row is present. Wedge volume is
    sum(deg^2)/2 — inherent to the measure; hubs bound it by their
    block (a 500-neighbor hub is a 125k-row in-block join, measured
    fine). At or below ``small_threshold`` distinct edges the whole
    chain runs in ONE remote task (the _triangles_one_task pattern —
    fixed exchange startup dwarfs small-graph compute).

    -> (id_a, id_b, cn) BIGINT counts, sorted (id_a, id_b); cross-path
    equality pytest-pinned."""
    import ray
    import ray.data as rd

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    node_t = _node_field(edges, a_col)
    und_schema = pa.schema([pa.field("a", node_t), pa.field("b", node_t)])
    out_schema = pa.schema(
        [
            pa.field("id_a", node_t),
            pa.field("id_b", node_t),
            pa.field("cn", pa.int64()),
        ]
    )

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return und_schema.empty_table()
        df = (
            pl.from_arrow(t.select([a_col, b_col]))
            .select(
                pl.min_horizontal(a_col, b_col).alias("a"),
                pl.max_horizontal(a_col, b_col).alias("b"),
            )
            .filter(pl.col("a") != pl.col("b"))
        )
        return df.to_arrow().cast(und_schema)

    dist = (
        key_counts(
            edges.map_batches(
                norm, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["a", "b"],
        )
        .map_batches(
            lambda t: t.select(["a", "b"]).cast(und_schema),
            batch_format="pyarrow",
        )
        .materialize()
    )
    m = dist.count()
    if m == 0:
        return rd.from_arrow(out_schema.empty_table())

    def cn_frame(df: "pl.DataFrame") -> "pl.DataFrame":
        """und edges -> (id_a, id_b, cn) in one process (small path +
        per-pair semantics ground truth)."""
        nbr = pl.concat(
            [
                df.select(pl.col("a").alias("c"), pl.col("b").alias("n")),
                df.select(pl.col("b").alias("c"), pl.col("a").alias("n")),
            ]
        )
        w = (
            nbr.join(nbr, on="c", suffix="_r")
            .filter(pl.col("n") < pl.col("n_r"))
            .group_by(["n", "n_r"])
            .agg(pl.len().cast(pl.Int64).alias("cn"))
            .rename({"n": "a", "n_r": "b"})
        )
        return (
            w.join(df, on=["a", "b"], how="anti")
            .filter(pl.col("cn") >= min_cn)
            .rename({"a": "id_a", "b": "id_b"})
            .sort(["id_a", "id_b"])
        )

    if m <= small_threshold:

        @ray.remote
        def cn_task(*blocks: pa.Table) -> pa.Table:
            df = pl.from_arrow(pa.concat_tables(blocks))
            return cn_frame(df).to_arrow().cast(out_schema)

        refs = dist.to_arrow_refs()
        return rd.from_arrow_refs([cn_task.remote(*refs)])

    parts = partitions_for(m)
    tag_schema = pa.schema(
        [
            pa.field("a", node_t),
            pa.field("b", node_t),
            pa.field("side", pa.int8()),
        ]
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        nbr = pl.concat(
            [
                df.select(pl.col("a").alias("c"), pl.col("b").alias("n")),
                df.select(pl.col("b").alias("c"), pl.col("a").alias("n")),
            ]
        )
        return nbr.to_arrow().cast(
            pa.schema([pa.field("c", node_t), pa.field("n", node_t)])
        )

    nbr_ds = dist.map_batches(both_dirs, batch_format="pyarrow")

    def wedge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tag_schema.empty_table()
        df = pl.from_arrow(t)
        j = (
            df.join(df, on="c", suffix="_r")
            .filter(pl.col("n") < pl.col("n_r"))
            .select(
                pl.col("n").alias("a"),
                pl.col("n_r").alias("b"),
                pl.lit(1, dtype=pl.Int8).alias("side"),
            )
        )
        return j.to_arrow().cast(tag_schema)

    wedges = grouped_apply(nbr_ds, ["c"], wedge_block, parts)

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "a": pc.cast(t["a"], node_t),
                "b": pc.cast(t["b"], node_t),
                "side": pa.array([0] * n, pa.int8()),
            },
            schema=tag_schema,
        )

    edge_tags = dist.map_batches(tag_edges, batch_format="pyarrow")

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by(["a", "b"])
            .agg(
                (pl.col("side") == 1).sum().cast(pl.Int64).alias("cn"),
                (pl.col("side") == 0).any().alias("_adj"),
            )
            .filter(~pl.col("_adj") & (pl.col("cn") >= min_cn))
            .rename({"a": "id_a", "b": "id_b"})
            .select(["id_a", "id_b", "cn"])
        )
        return df.to_arrow().cast(out_schema)

    return grouped_apply(
        wedges.union(edge_tags), ["a", "b"], merge_block, parts
    ).sort(["id_a", "id_b"])


def k_truss(
    edges: Dataset,
    k: int = 4,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 64,
    small_threshold: int = 2_000_000,
) -> Dataset:
    """k-truss of the undirected simple graph (Cohen 2008): the
    maximal subgraph in which EVERY edge closes at least k-2 triangles
    — the edge-level cohesion filter link-spam analysis applies where
    node-level k-core is too blunt (a hub passes any core threshold;
    its spokes close no triangles and fall out of every truss).
    Iterative peel: drop all edges with support < k-2, recompute,
    repeat to fixed point.

    Scale shape: per round, an edge's support is its endpoints'
    common-neighbor count within the CURRENT edge set — the
    common_neighbors machinery keyed per edge: wedge pairs per apex
    block (one key-aligned exchange), then a merge exchange on (a, b)
    where edge rows union-tag in and only side=0 rows survive with
    their wedge count. Exchanges are sized to the measured live edge
    count each round; a fixed point is detected by count. At or below
    ``small_threshold`` distinct edges the whole peel runs in ONE
    remote task (iterative Dataset loops pay operator-actor startup
    per round — CLAUDE.md).

    -> (id_a, id_b, support) for surviving edges, with support
    computed on the FINAL subgraph; sorted (id_a, id_b). Raises if the
    peel has not converged after ``max_rounds`` (support peeling
    removes >= 1 edge per non-final round, so this only fires on a
    graph with more than max_rounds cascade depth — raise, never
    return a non-fixed-point)."""
    import ray
    import ray.data as rd

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    node_t = _node_field(edges, a_col)
    und_schema = pa.schema([pa.field("a", node_t), pa.field("b", node_t)])
    out_schema = pa.schema(
        [
            pa.field("id_a", node_t),
            pa.field("id_b", node_t),
            pa.field("support", pa.int64()),
        ]
    )
    min_sup = k - 2

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return und_schema.empty_table()
        df = (
            pl.from_arrow(t.select([a_col, b_col]))
            .select(
                pl.min_horizontal(a_col, b_col).alias("a"),
                pl.max_horizontal(a_col, b_col).alias("b"),
            )
            .filter(pl.col("a") != pl.col("b"))
        )
        return df.to_arrow().cast(und_schema)

    dist = (
        key_counts(
            edges.map_batches(
                norm, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["a", "b"],
        )
        .map_batches(
            lambda t: t.select(["a", "b"]).cast(und_schema),
            batch_format="pyarrow",
        )
        .materialize()
    )
    m = dist.count()
    if m == 0:
        return rd.from_arrow(out_schema.empty_table())

    def support_frame(df: "pl.DataFrame") -> "pl.DataFrame":
        """(a, b, support) for every edge of df (a<b distinct)."""
        nbr = pl.concat(
            [
                df.select(pl.col("a").alias("c"), pl.col("b").alias("n")),
                df.select(pl.col("b").alias("c"), pl.col("a").alias("n")),
            ]
        )
        w = (
            nbr.join(nbr, on="c", suffix="_r")
            .filter(pl.col("n") < pl.col("n_r"))
            .group_by(["n", "n_r"])
            .agg(pl.len().cast(pl.Int64).alias("support"))
            .rename({"n": "a", "n_r": "b"})
        )
        return df.join(w, on=["a", "b"], how="left").with_columns(
            pl.col("support").fill_null(0)
        )

    if m <= small_threshold:

        @ray.remote
        def truss_task(*blocks: pa.Table) -> pa.Table:
            df = pl.from_arrow(pa.concat_tables(blocks))
            for _ in range(max_rounds):
                sup = support_frame(df)
                kept = sup.filter(pl.col("support") >= min_sup)
                if kept.height == df.height:
                    return (
                        kept.rename({"a": "id_a", "b": "id_b"})
                        .sort(["id_a", "id_b"])
                        .to_arrow()
                        .cast(out_schema)
                    )
                df = kept.select(["a", "b"])
                if df.height == 0:
                    return out_schema.empty_table()
            raise RuntimeError(
                f"k_truss: no fixed point after {max_rounds} rounds"
            )

        refs = dist.to_arrow_refs()
        return rd.from_arrow_refs([truss_task.remote(*refs)])

    tag_schema = pa.schema(
        [
            pa.field("a", node_t),
            pa.field("b", node_t),
            pa.field("side", pa.int8()),
        ]
    )
    sup_schema = pa.schema(
        [
            pa.field("a", node_t),
            pa.field("b", node_t),
            pa.field("support", pa.int64()),
        ]
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        nbr = pl.concat(
            [
                df.select(pl.col("a").alias("c"), pl.col("b").alias("n")),
                df.select(pl.col("b").alias("c"), pl.col("a").alias("n")),
            ]
        )
        return nbr.to_arrow().cast(
            pa.schema([pa.field("c", node_t), pa.field("n", node_t)])
        )

    def wedge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tag_schema.empty_table()
        df = pl.from_arrow(t)
        j = (
            df.join(df, on="c", suffix="_r")
            .filter(pl.col("n") < pl.col("n_r"))
            .select(
                pl.col("n").alias("a"),
                pl.col("n_r").alias("b"),
                pl.lit(1, dtype=pl.Int8).alias("side"),
            )
        )
        return j.to_arrow().cast(tag_schema)

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "a": pc.cast(t["a"], node_t),
                "b": pc.cast(t["b"], node_t),
                "side": pa.array([0] * n, pa.int8()),
            },
            schema=tag_schema,
        )

    def edge_support_block(t: pa.Table) -> pa.Table:
        # per (a, b): support = side-1 wedge count, kept only when a
        # side-0 edge row is present (wedges over non-edges drop here)
        if t.num_rows == 0:
            return sup_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by(["a", "b"])
            .agg(
                (pl.col("side") == 1).sum().cast(pl.Int64).alias("support"),
                (pl.col("side") == 0).any().alias("_edge"),
            )
            .filter(pl.col("_edge"))
            .select(["a", "b", "support"])
        )
        return df.to_arrow().cast(sup_schema)

    cur, n_cur = dist, m
    for _ in range(max_rounds):
        parts = partitions_for(n_cur)
        nbr_ds = cur.map_batches(both_dirs, batch_format="pyarrow")
        wedges = grouped_apply(nbr_ds, ["c"], wedge_block, parts)
        edge_tags = cur.map_batches(tag_edges, batch_format="pyarrow")
        sup = grouped_apply(
            wedges.union(edge_tags), ["a", "b"], edge_support_block, parts
        ).materialize()

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.greater_equal(t["support"], min_sup)
            )

        kept = sup.map_batches(keep, batch_format="pyarrow").materialize()
        n_kept = kept.count()
        if n_kept == n_cur:
            return kept.map_batches(
                lambda t: pa.table(
                    {
                        "id_a": t["a"],
                        "id_b": t["b"],
                        "support": t["support"],
                    },
                    schema=out_schema,
                ),
                batch_format="pyarrow",
            ).sort(["id_a", "id_b"])
        if n_kept == 0:
            return rd.from_arrow(out_schema.empty_table())
        cur = kept.map_batches(
            lambda t: t.select(["a", "b"]).cast(und_schema),
            batch_format="pyarrow",
        ).materialize()
        n_cur = n_kept
    raise RuntimeError(f"k_truss: no fixed point after {max_rounds} rounds")
