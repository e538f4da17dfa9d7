"""Input validation shared by the framework integrations.

Reference: integrations/langchain/src/langchain_velesdb/security.py and
the identical copy under integrations/llamaindex (limits :12-20,
validators :28-316). Same limits, same error type, same normalization
(metric/storage-mode lowercased, paths absolutized) so applications that
catch SecurityError port unchanged.
"""

from __future__ import annotations

import os
import re

MAX_QUERY_LENGTH = 10_000      # max characters for VelesQL queries
MAX_TEXT_LENGTH = 1_000_000    # max characters per document (1 MB)
MAX_BATCH_SIZE = 10_000        # max documents per batch operation
MAX_K_VALUE = 10_000           # max top_k for search
MAX_DIMENSION = 65_536
MIN_DIMENSION = 1
MAX_PATH_LENGTH = 4096

ALLOWED_METRICS = {"cosine", "euclidean", "dot", "hamming", "jaccard"}
ALLOWED_STORAGE_MODES = {"full", "sq8", "binary"}


class SecurityError(ValueError):
    """Raised when an input fails validation (security.py:23-25)."""


def validate_path(path: str) -> str:
    if not path:
        raise SecurityError("Path cannot be empty")
    if len(path) > MAX_PATH_LENGTH:
        raise SecurityError(f"Path exceeds maximum length of {MAX_PATH_LENGTH}")
    if "\x00" in path:
        raise SecurityError("Path contains null bytes")
    for pattern in (r"\.\.[/\\]", r"^[/\\]{2}"):
        if re.search(pattern, path):
            raise SecurityError("Suspicious path pattern detected")
    try:
        return os.path.abspath(os.path.normpath(path))
    except (ValueError, OSError) as e:
        raise SecurityError(f"Invalid path: {e}") from e


def validate_dimension(dimension: int) -> int:
    if not isinstance(dimension, int):
        raise SecurityError(
            f"Dimension must be an integer, got {type(dimension).__name__}")
    if dimension < MIN_DIMENSION:
        raise SecurityError(f"Dimension must be at least {MIN_DIMENSION}")
    if dimension > MAX_DIMENSION:
        raise SecurityError(f"Dimension exceeds maximum of {MAX_DIMENSION}")
    return dimension


def validate_k(k: int, param_name: str = "k") -> int:
    if not isinstance(k, int):
        raise SecurityError(
            f"{param_name} must be an integer, got {type(k).__name__}")
    if k < 1:
        raise SecurityError(f"{param_name} must be at least 1")
    if k > MAX_K_VALUE:
        raise SecurityError(f"{param_name} exceeds maximum of {MAX_K_VALUE}")
    return k


def validate_text(text: str, max_length: int = MAX_TEXT_LENGTH) -> str:
    if not isinstance(text, str):
        raise SecurityError(
            f"Text must be a string, got {type(text).__name__}")
    if len(text) > max_length:
        raise SecurityError(f"Text exceeds maximum length of {max_length}")
    return text


def validate_query(query: str) -> str:
    if not isinstance(query, str):
        raise SecurityError(
            f"Query must be a string, got {type(query).__name__}")
    if len(query) > MAX_QUERY_LENGTH:
        raise SecurityError(
            f"Query exceeds maximum length of {MAX_QUERY_LENGTH}")
    if "\x00" in query:
        raise SecurityError("Query contains null bytes")
    return query


def validate_metric(metric: str) -> str:
    if not isinstance(metric, str):
        raise SecurityError(
            f"Metric must be a string, got {type(metric).__name__}")
    m = metric.lower()
    if m not in ALLOWED_METRICS:
        raise SecurityError(
            f"Invalid metric '{metric}'. "
            f"Allowed: {', '.join(sorted(ALLOWED_METRICS))}")
    return m


def validate_storage_mode(mode: str) -> str:
    if not isinstance(mode, str):
        raise SecurityError(
            f"Storage mode must be a string, got {type(mode).__name__}")
    m = mode.lower()
    if m not in ALLOWED_STORAGE_MODES:
        raise SecurityError(
            f"Invalid storage mode '{mode}'. "
            f"Allowed: {', '.join(sorted(ALLOWED_STORAGE_MODES))}")
    return m


def validate_batch_size(size: int) -> int:
    if size > MAX_BATCH_SIZE:
        raise SecurityError(
            f"Batch size {size} exceeds maximum of {MAX_BATCH_SIZE}. "
            f"Process in smaller batches.")
    return size


def validate_collection_name(name: str) -> str:
    if not isinstance(name, str):
        raise SecurityError(
            f"Collection name must be a string, got {type(name).__name__}")
    if not name:
        raise SecurityError("Collection name cannot be empty")
    if len(name) > 256:
        raise SecurityError("Collection name exceeds maximum length of 256")
    if not re.match(r"^[a-zA-Z0-9_-]+$", name):
        raise SecurityError(
            "Collection name can only contain alphanumeric characters, "
            "underscores, and hyphens")
    return name


def validate_url(url: str) -> str:
    if not isinstance(url, str):
        raise SecurityError(f"URL must be a string, got {type(url).__name__}")
    if not url:
        raise SecurityError("URL cannot be empty")
    if not url.startswith(("http://", "https://")):
        raise SecurityError("URL must start with http:// or https://")
    if any(c in url for c in ("\n", "\r", "\x00")):
        raise SecurityError("URL contains invalid characters")
    return url


def validate_weight(weight: float, name: str = "weight") -> float:
    if not isinstance(weight, (int, float)):
        raise SecurityError(
            f"{name} must be a number, got {type(weight).__name__}")
    if weight < 0.0 or weight > 1.0:
        raise SecurityError(
            f"{name} must be between 0.0 and 1.0, got {weight}")
    return float(weight)
