"""Run-level machinery: checkpointed, resumable pipelines with
per-partition lineage + metrics."""
