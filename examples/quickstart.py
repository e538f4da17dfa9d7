#!/usr/bin/env python3
"""velesdb-spark quickstart — the embedded-API tour a reference user
takes after switching (the reference's examples/ drive its REST server;
this engine is batch-embedded, so the same operations run in-process on
a SparkSession).

Run: ``python examples/quickstart.py`` (or import and call
``main(spark)`` — the test suite executes it end-to-end).
"""

from __future__ import annotations


def main(spark=None, verbose: bool = True) -> dict:
    """Runs the full tour; returns the results dict (tested)."""
    from velesdb_spark.database import Database

    if spark is None:
        from velesdb_spark.session import get_spark

        spark = get_spark("velesdb-quickstart")
        spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}

    def log(msg):
        if verbose:
            print(msg)

    # 1. create a collection and upsert points (id + vector + payload)
    db = Database(spark)
    col = db.create_collection("articles", dimension=4, text_col="title")
    col.upsert([
        {"id": 1, "vector": [1.0, 0.0, 0.0, 0.0],
         "title": "Intro to Spark", "category": "data", "score": 90},
        {"id": 2, "vector": [0.9, 0.1, 0.0, 0.0],
         "title": "Advanced Spark SQL", "category": "data", "score": 85},
        {"id": 3, "vector": [0.0, 1.0, 0.0, 0.0],
         "title": "Rust ownership explained", "category": "lang", "score": 95},
        {"id": 4, "vector": [0.0, 0.0, 1.0, 0.0],
         "title": "Graph databases in practice", "category": "db", "score": 80},
    ])
    out["count"] = col.count()
    log(f"upserted {out['count']} points")

    # 2. vector search (exact k-NN — recall 1.0 by construction)
    hits = col.search([1.0, 0.05, 0.0, 0.0], k=2).collect()
    out["knn"] = [r["id"] for r in hits]
    log(f"k-NN: {out['knn']}")

    # 3. text search (BM25) and hybrid vector+text fusion
    out["text"] = [r["id"] for r in
                   col.text_search("spark", k=3).collect()]
    out["hybrid"] = [r["id"] for r in col.hybrid_search(
        "spark sql", [1.0, 0.0, 0.0, 0.0], k=3).collect()]
    log(f"text: {out['text']}  hybrid: {out['hybrid']}")

    # 4. VelesQL — SELECT with predicates, params, similarity ordering
    rows = col.query(
        "SELECT id, title FROM articles WHERE score >= $smin "
        "ORDER BY similarity(vector, $v) DESC LIMIT 2",
        {"smin": 80, "v": [1.0, 0.0, 0.0, 0.0]}).collect()
    out["velesql"] = [r["id"] for r in rows]
    log(f"VelesQL: {out['velesql']}")

    # 5. graph layer — edges, MATCH, BFS
    col.add_edges([
        {"id": 10, "src": 1, "dst": 2, "label": "CITES"},
        {"id": 11, "src": 2, "dst": 3, "label": "CITES"},
        {"id": 12, "src": 1, "dst": 4, "label": "MENTIONS"},
    ])
    m = col.query(
        "MATCH (a)-[:CITES]->(b) RETURN a.title AS src, b.title AS dst "
        "ORDER BY src, dst").collect()
    out["match"] = [(r["src"], r["dst"]) for r in m]
    out["bfs"] = sorted(r["node_id"] for r in
                        col.traverse_bfs(1, max_depth=2).collect())
    log(f"MATCH: {out['match']}\nBFS from 1: {out['bfs']}")

    # 6. EXPLAIN — the reference-shaped plan tree + Catalyst plan
    out["explain_has_strategy"] = "GraphFirst" in col.explain(
        "MATCH (a)-[:CITES]->(b) RETURN a.title")
    return out


if __name__ == "__main__":
    main()
