"""Training-data pipeline operators over text corpora.

All hot-path logic is built-in Spark SQL functions (codegen, no Python)
— dedup group-bys, shingle explodes, window top-k. Pandas UDFs appear
only where SQL cannot express the kernel (none so far).
"""
