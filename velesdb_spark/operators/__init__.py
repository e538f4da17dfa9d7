"""velesdb_spark subpackage."""
