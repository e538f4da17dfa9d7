"""Engine configuration — parity with the reference's ``config.rs``
(VelesConfig: search/hnsw/storage/limits/server/logging sections, TOML
round-trip, range validation; tested by config_tests.rs).

A user's ``veles.toml`` loads and validates here with the reference's
exact rules, so deployments migrate without editing their config. The
Spark engine EXECUTES as SearchMode::Perfect (exact distributed top-k)
regardless of mode — ``effective_ef_search`` is surfaced for the
EXPLAIN report and for tools that read it, and the limits section feeds
the guardrails layer.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Optional


class ConfigError(ValueError):
    """config.rs ConfigError::InvalidValue / ParseError."""


class SearchMode:
    """config.rs:46-71 — preset search modes with their ef_search.
    Perfect signals bruteforce, which is this engine's only (and exact)
    execution; the other presets matter for config compatibility."""

    FAST = "fast"
    BALANCED = "balanced"
    ACCURATE = "accurate"
    PERFECT = "perfect"

    ALL = (FAST, BALANCED, ACCURATE, PERFECT)
    _EF = {FAST: 64, BALANCED: 128, ACCURATE: 256,
           PERFECT: 2 ** 63 - 1}  # usize::MAX signal

    @classmethod
    def ef_search(cls, mode: str) -> int:
        return cls._EF[mode]

    @classmethod
    def default(cls) -> str:
        return cls.BALANCED


@dataclass
class SearchConfig:
    """config.rs:73-96."""

    default_mode: str = SearchMode.BALANCED
    ef_search: Optional[int] = None
    max_results: int = 1000
    query_timeout_ms: int = 30000


@dataclass
class HnswConfig:
    """config.rs:98-109 (accepted for compatibility; the exact engine
    has no graph to build — values still validate)."""

    m: Optional[int] = None
    ef_construction: Optional[int] = None
    max_layers: int = 0


@dataclass
class StorageConfig:
    """config.rs storage section."""

    data_dir: str = "./data"
    storage_mode: str = "mmap"


@dataclass
class LimitsConfig:
    max_dimensions: int = 4096


@dataclass
class ServerConfig:
    host: str = "127.0.0.1"
    port: int = 8080


@dataclass
class LoggingConfig:
    level: str = "info"


_SECTIONS = {"search": SearchConfig, "hnsw": HnswConfig,
             "storage": StorageConfig, "limits": LimitsConfig,
             "server": ServerConfig, "logging": LoggingConfig}


@dataclass
class VelesConfig:
    """config.rs VelesConfig — sectioned config with defaults."""

    search: SearchConfig = field(default_factory=SearchConfig)
    hnsw: HnswConfig = field(default_factory=HnswConfig)
    storage: StorageConfig = field(default_factory=StorageConfig)
    limits: LimitsConfig = field(default_factory=LimitsConfig)
    server: ServerConfig = field(default_factory=ServerConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)

    # ------------------------------------------------------------ load
    @classmethod
    def from_toml(cls, text: str) -> "VelesConfig":
        """Parse TOML with defaults for absent sections/keys
        (config.rs serde(default)); unknown search modes are a parse
        error, matching serde's enum rejection."""
        import tomllib

        try:
            raw = tomllib.loads(text)
        except tomllib.TOMLDecodeError as e:
            raise ConfigError(f"TOML parse error: {e}") from e
        cfg = cls()
        for section, klass in _SECTIONS.items():
            vals = raw.get(section, {})
            if not isinstance(vals, dict):
                raise ConfigError(f"section [{section}] must be a table")
            obj = getattr(cfg, section)
            for k, v in vals.items():
                if not hasattr(obj, k):
                    raise ConfigError(f"unknown key {section}.{k}")
                setattr(obj, k, v)
        if cfg.search.default_mode not in SearchMode.ALL:
            raise ConfigError(
                f"search.default_mode '{cfg.search.default_mode}' is "
                f"invalid, expected one of: {list(SearchMode.ALL)}")
        return cfg

    def to_toml(self) -> str:
        """Serialize (config.rs to_toml); None keys are omitted like
        serde's skipped Options."""
        out = []
        for section in _SECTIONS:
            out.append(f"[{section}]")
            for k, v in asdict(getattr(self, section)).items():
                if v is None:
                    continue
                if isinstance(v, bool):
                    out.append(f"{k} = {'true' if v else 'false'}")
                elif isinstance(v, (int, float)):
                    out.append(f"{k} = {v}")
                else:
                    out.append(f'{k} = "{v}"')
            out.append("")
        return "\n".join(out)

    # ------------------------------------------------------------ checks
    def validate(self) -> None:
        """config.rs:330-414 — the exact ranges and key names."""
        def bad(key: str, msg: str):
            raise ConfigError(f"invalid value for {key}: {msg}")

        ef = self.search.ef_search
        if ef is not None and not 16 <= ef <= 4096:
            bad("search.ef_search", f"value {ef} is out of range [16, 4096]")
        if not 1 <= self.search.max_results <= 10000:
            bad("search.max_results",
                f"value {self.search.max_results} is out of range [1, 10000]")
        if self.hnsw.m is not None and not 4 <= self.hnsw.m <= 128:
            bad("hnsw.m", f"value {self.hnsw.m} is out of range [4, 128]")
        efc = self.hnsw.ef_construction
        if efc is not None and not 100 <= efc <= 2000:
            bad("hnsw.ef_construction",
                f"value {efc} is out of range [100, 2000]")
        if not 1 <= self.limits.max_dimensions <= 65536:
            bad("limits.max_dimensions",
                f"value {self.limits.max_dimensions} is out of range "
                "[1, 65536]")
        if self.server.port < 1024:
            bad("server.port", f"value {self.server.port} must be >= 1024")
        if self.storage.storage_mode not in ("mmap", "memory"):
            bad("storage.storage_mode",
                f"value '{self.storage.storage_mode}' is invalid, expected "
                "one of: ['mmap', 'memory']")
        if self.logging.level not in ("error", "warn", "info", "debug",
                                      "trace"):
            bad("logging.level",
                f"value '{self.logging.level}' is invalid, expected one "
                "of: ['error', 'warn', 'info', 'debug', 'trace']")

    def effective_ef_search(self) -> int:
        """config.rs:417-426: explicit override wins, else the mode's."""
        if self.search.ef_search is not None:
            return self.search.ef_search
        return SearchMode.ef_search(self.search.default_mode)
