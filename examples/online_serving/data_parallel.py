"""Data-parallel serving: engine replicas over disjoint device slices
(ref: examples/offline_inference/data_parallel.py + the DP LB test suites).

  python -m vllm_metax_tpu serve --model ... \
      --tensor-parallel-size 2 --data-parallel-size 4   # 8 chips total
"""
