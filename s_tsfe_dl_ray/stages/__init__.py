from .rollup import Metric, RollupSpec, rollup_partial, cascade, finalize  # noqa: F401
