from pyhybridcontrol_tpu.configs.benchmarks import (
    BENCHMARK_CONFIGS,
    BenchmarkConfig,
    get_config,
)

__all__ = ["BENCHMARK_CONFIGS", "BenchmarkConfig", "get_config"]
