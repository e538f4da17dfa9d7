"""velesdb-spark — a PySpark-native engine with VelesDB's query capabilities.

Brand-new implementation: VelesQL (the reference's SQL dialect, see
/root/reference grammar at crates/velesdb-core/src/velesql/grammar.pest) is
parsed in Python and translated to Spark DataFrame programs; vector search is
exact distributed top-k; BM25 is a corpus-statistics score join; graph MATCH is
bounded iterative joins. Catalyst/AQE provide optimization.
"""

from velesdb_spark.database import Collection, Database
from velesdb_spark.session import get_spark

__all__ = ["Collection", "Database", "get_spark"]

__version__ = "0.1.0"
