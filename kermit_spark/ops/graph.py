"""Link-graph operators — BFS wave/depth assignment.

The crawl engine's wave structure IS breadth-first search over the link graph
(SURVEY §2.8 contract #1: a URL's wave = its first-discovery depth, because
children are scheduled with parents+1 — /root/reference/src/kermit/extensions/
ext.discovery.coffee:43-44 — and the unique index drops re-discoveries —
QueueSystem.coffee:162,199). ``bfs_depths`` is that semantic as a standalone
operator over an arbitrary (src, dst) edge table; the live engine runs the
same fixpoint through Crawler.crawl with fetching in the loop.

Scale shape: one hash-join + distinct + anti-join per level — all shuffles
keyed on node ids, frontier-sized not graph-sized. ``localCheckpoint``
truncates the logical plan each level; without it analysis cost doubles per
wave (iterative-algorithm standard practice on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """First-discovery depth per reachable node.

    ``edges``: (src, dst) rows; ``seeds``: (node) rows (depth 0). Returns
    (node, depth) for every node reachable within ``max_depth`` levels —
    exactly the frontier's (url, wave) assignment with fetching stripped out.
    """
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).persist()
    seen = seeds.select(F.col("node"), F.lit(0).alias("depth")).localCheckpoint()
    frontier = seen
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(seen.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).alias("depth"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        seen = seen.unionByName(nxt).localCheckpoint()
        frontier = nxt
    edges.unpersist()
    return seen
