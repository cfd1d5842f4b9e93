"""Driver-contract query bodies + DuckDB oracle twins (split out of
``__ray_entry__.py``, VERDICT r4 #8).  ``registry.build_queries`` owns
the recorded-50 ordering; ``oracles.build_oracle_sql`` the SQL twins."""

from .oracles import build_oracle_sql
from .registry import build_queries

__all__ = ["build_queries", "build_oracle_sql"]
