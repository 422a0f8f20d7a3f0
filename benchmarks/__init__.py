# Makes the benchmark harness importable (bench.py embeds the per-config
# matrix from run_configs.collect_configs in the driver's JSON line).
