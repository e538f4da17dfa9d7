"""Graph schema for heterogeneous knowledge graphs
(collection/graph/schema.rs): strict mode validates node/edge types against
declared definitions; schemaless accepts anything.

Spark twist: besides the reference's per-item validate calls, the schema
validates a whole edge DataFrame in one distributed pass —
``violations_df`` joins edges against the declared (label, from, to)
triples and each endpoint's node-type table, so a 100 TB edge load is
checked with two hash joins instead of per-row calls.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALUE_TYPES = {"string", "integer", "float", "boolean", "vector"}


class SchemaValidationError(ValueError):
    pass


@dataclass
class NodeType:
    """schema.rs NodeType: name + property name→type map."""

    name: str
    properties: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        bad = set(self.properties.values()) - VALUE_TYPES
        if bad:
            raise SchemaValidationError(f"unknown property types: {sorted(bad)}")


@dataclass
class EdgeType:
    """schema.rs EdgeType: name + endpoint node types + properties."""

    name: str
    from_type: str
    to_type: str
    properties: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        bad = set(self.properties.values()) - VALUE_TYPES
        if bad:
            raise SchemaValidationError(f"unknown property types: {sorted(bad)}")


class GraphSchema:
    """schema.rs GraphSchema (strict or schemaless)."""

    def __init__(self, schemaless: bool = False):
        self.schemaless = schemaless
        self.node_types: Dict[str, NodeType] = {}
        self.edge_types: Dict[str, EdgeType] = {}

    @classmethod
    def strict(cls) -> "GraphSchema":
        return cls(schemaless=False)

    @classmethod
    def schemaless_schema(cls) -> "GraphSchema":
        return cls(schemaless=True)

    def with_node_type(self, nt: NodeType) -> "GraphSchema":
        self.node_types[nt.name] = nt
        return self

    def with_edge_type(self, et: EdgeType) -> "GraphSchema":
        self.edge_types[et.name] = et
        return self

    def has_node_type(self, name: str) -> bool:
        return name in self.node_types

    # ---- per-item validation (reference signatures) -------------------
    def validate_node_type(self, type_name: str) -> None:
        if self.schemaless:
            return
        if type_name not in self.node_types:
            raise SchemaValidationError(
                f"Node type '{type_name}' not declared in strict schema")

    def validate_edge_type(self, edge_type: str, from_type: str,
                           to_type: str) -> None:
        if self.schemaless:
            return
        d = self.edge_types.get(edge_type)
        if d is None:
            raise SchemaValidationError(
                f"Edge type '{edge_type}' not declared in strict schema")
        if d.from_type != from_type:
            raise SchemaValidationError(
                f"Edge '{edge_type}' expects source type '{d.from_type}', "
                f"got '{from_type}'")
        if d.to_type != to_type:
            raise SchemaValidationError(
                f"Edge '{edge_type}' expects target type '{d.to_type}', "
                f"got '{to_type}'")
        for t in (from_type, to_type):
            if not self.has_node_type(t):
                raise SchemaValidationError(
                    f"Edge '{edge_type}' references undeclared node type '{t}'")

    # ---- distributed validation ---------------------------------------
    def violations_df(self, edges: DataFrame,
                      node_labels: Optional[DataFrame] = None) -> DataFrame:
        """Edges violating the strict schema, with a reason column.

        ``edges``: (id, src, dst, label). ``node_labels``: optional
        (id, node_type) table; when given, each edge's endpoint types are
        joined in and checked against the edge definition. Empty result =
        valid. Schemaless → always empty.
        """
        spark = edges.sparkSession
        if self.schemaless:
            return edges.select("id", F.lit("").alias("reason")).limit(0)
        defs = spark.createDataFrame(
            [(e.name, e.from_type, e.to_type) for e in self.edge_types.values()]
            or [("", "", "")],
            "label string, _from string, _to string")
        joined = edges.join(F.broadcast(defs), "label", "left")
        bad_label = joined.filter(F.col("_from").isNull()).select(
            "id", F.concat(F.lit("undeclared edge type: "), F.col("label"))
            .alias("reason"))
        if node_labels is None:
            return bad_label
        nl_src = node_labels.select(F.col("id").alias("src"),
                                    F.col("node_type").alias("_src_t"))
        nl_dst = node_labels.select(F.col("id").alias("dst"),
                                    F.col("node_type").alias("_dst_t"))
        typed = (joined.filter(F.col("_from").isNotNull())
                 .join(nl_src, "src", "left").join(nl_dst, "dst", "left"))
        bad_ends = typed.filter(
            (F.col("_src_t") != F.col("_from"))
            | (F.col("_dst_t") != F.col("_to"))
            | F.col("_src_t").isNull() | F.col("_dst_t").isNull()).select(
            "id",
            F.concat(F.lit("endpoint type mismatch for edge type "),
                     F.col("label")).alias("reason"))
        return bad_label.unionByName(bad_ends)
