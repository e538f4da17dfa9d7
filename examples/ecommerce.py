#!/usr/bin/env python3
"""E-commerce recommendation demo — Vector + Graph + MultiColumn combined.

Reference: examples/ecommerce_recommendation (the flagship demo, README
"Vector + Graph + MultiColumn Combined Power"): products with embeddings
and business columns, a behavior graph (BOUGHT_TOGETHER / VIEWED_ALSO),
and four query types — pure vector similarity, vector+filter VelesQL,
graph traversal, and the combined 0.6·vector + 0.4·graph scorer with
business-rule filters. Here each query is ONE lazy DataFrame plan: the
combined scorer is a union + groupBy-sum + join, not a driver loop, so
the same code runs on 5k demo products or a 100 TB catalog.

Run: ``python examples/ecommerce.py`` (the test suite executes
``main(spark)`` end-to-end so the demo stays living documentation).
"""

from __future__ import annotations

CATEGORIES = [("Electronics", "Smartphones"), ("Electronics", "Laptops"),
              ("Home", "Kitchen"), ("Sports", "Outdoor")]
BRANDS = ["TechPro", "HomeBase", "PeakGear", "Volt"]
DIM = 32


def generate_data(n_products: int = 400, seed: int = 7):
    """Deterministic product catalog + behavior edges (README data model:
    products with 11 business fields + embedding; BOUGHT_TOGETHER /
    VIEWED_ALSO relationships)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    # category anchor vectors make "semantically similar" meaningful
    anchors = rng.randn(len(CATEGORIES), DIM)
    products = []
    for i in range(1, n_products + 1):
        ci = int(rng.randint(len(CATEGORIES)))
        cat, sub = CATEGORIES[ci]
        emb = anchors[ci] + 0.35 * rng.randn(DIM)
        products.append({
            "id": i,
            "name": f"{BRANDS[i % len(BRANDS)]} {sub} {i}",
            "category": cat, "subcategory": sub,
            "brand": BRANDS[i % len(BRANDS)],
            "price": float(np.round(rng.uniform(10, 1500), 2)),
            "rating": float(np.round(rng.uniform(2.5, 5.0), 1)),
            "review_count": int(rng.randint(0, 5000)),
            "in_stock": bool(rng.rand() < 0.85),
            "stock_quantity": int(rng.randint(0, 200)),
            "labels": ["Product"],
            "vector": [float(x) for x in emb],
        })
    # the demo anchor (product 42) always has co-purchases to show
    edges = [{"id": 900001, "src": 42, "dst": 43,
              "label": "BOUGHT_TOGETHER"},
             {"id": 900002, "src": 42, "dst": 44,
              "label": "BOUGHT_TOGETHER"},
             {"id": 900003, "src": 42, "dst": 45, "label": "VIEWED_ALSO"}]
    eid = 0
    for i in range(1, n_products + 1):
        # co-purchase edges cluster inside the category; views wander
        for _ in range(int(rng.randint(1, 4))):
            j = int(rng.randint(1, n_products + 1))
            if j == i:
                continue
            eid += 1
            label = "BOUGHT_TOGETHER" if rng.rand() < 0.6 else "VIEWED_ALSO"
            edges.append({"id": eid, "src": i, "dst": j, "label": label})
    return products, edges


def main(spark=None, verbose: bool = True) -> dict:
    """Runs the four reference queries; returns the results dict."""
    import numpy as np
    from pyspark.sql import functions as F

    from velesdb_spark.database import Database

    if spark is None:
        from velesdb_spark.session import get_spark

        spark = get_spark("velesdb-ecommerce")
        spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}

    def log(msg):
        if verbose:
            print(msg)

    products, edges = generate_data()
    db = Database(spark)
    col = db.create_collection("products", dimension=DIM, text_col="name")
    col.upsert(products)
    col.add_edges(edges)
    out["n_products"], out["n_edges"] = len(products), len(edges)
    log(f"indexed {out['n_products']} products, {out['n_edges']} edges")

    # the shopper is looking at product 42
    anchor = next(p for p in products if p["id"] == 42)
    qv = anchor["vector"]

    # ---- Query 1: pure vector similarity (README "Query 1")
    q1 = col.search(qv, k=10).select("id", "name", "score").collect()
    out["q1_ids"] = [r["id"] for r in q1]
    assert out["q1_ids"][0] == 42  # self-match ranks first
    log(f"Q1 similar products: {out['q1_ids']}")

    # ---- Query 2: vector + business filter in VelesQL (README "Query 2")
    q2 = col.query(
        "SELECT id, name, price FROM products "
        "WHERE similarity(vector, $v) > 0.5 AND in_stock = TRUE "
        "AND price < 500.0 "
        "ORDER BY similarity(vector, $v) DESC LIMIT 10",
        {"v": qv}).collect()
    out["q2_ids"] = [r["id"] for r in q2]
    log(f"Q2 in-stock under $500: {out['q2_ids']}")

    # ---- Query 3: graph traversal — bought together (README "Query 3")
    q3 = col.query(
        "MATCH (p:Product)-[:BOUGHT_TOGETHER]->(other:Product) "
        "WHERE p.id = 42 RETURN other.id AS rec_id, other.name AS rec "
        "ORDER BY rec_id LIMIT 10").collect()
    out["q3_ids"] = [r["rec_id"] for r in q3]
    assert 43 in out["q3_ids"] and 44 in out["q3_ids"]
    assert 45 not in out["q3_ids"]  # VIEWED_ALSO is a different label
    log(f"Q3 bought together: {out['q3_ids']}")

    # ---- Query 4: combined 0.6·vector + 0.4·graph with business rules
    # (README "Query 4") — one lazy plan: both sources are (id, score)
    # frames; union → groupBy-sum → join business columns → filter → top-k
    vec_scores = (col.search(qv, k=50)
                  .select("id", (F.col("score") * 0.6).alias("part")))
    graph_ids = col.traverse_bfs(42, max_depth=1).select(
        F.col("node_id").alias("id"), F.lit(0.4).alias("part"))
    price_cap = 1000.0
    combined = (vec_scores.unionByName(graph_ids)
                .groupBy("id").agg(F.sum("part").alias("rec_score"))
                .filter(F.col("id") != 42)
                .join(col.df.select("id", "name", "price", "rating",
                                    "in_stock"), "id")
                .filter(F.col("in_stock") & (F.col("rating") >= 4.0)
                        & (F.col("price") < price_cap))
                .orderBy(F.desc("rec_score"), F.asc("id")).limit(10))
    q4 = combined.collect()
    out["q4"] = [(r["id"], round(r["rec_score"], 4)) for r in q4]
    assert all(r["rating"] >= 4.0 and r["price"] < price_cap for r in q4)
    log(f"Q4 combined recommendations: {[i for i, _ in out['q4']]}")
    return out


if __name__ == "__main__":
    main()
