"""PipelineConfig resolution + override-merge semantics."""

import os

from docling_service_ray.config import PipelineConfig


def test_defaults_and_merge():
    cfg = PipelineConfig()
    assert cfg.batch_size == 256 and cfg.salt_span == 64
    merged = cfg.merged(batch_size=512, retention_days=None)
    assert merged.batch_size == 512
    assert merged.retention_days is None  # None never overrides
    assert cfg.batch_size == 256  # frozen original untouched


def test_from_env(monkeypatch):
    monkeypatch.setenv("GRAFT_BATCH_SIZE", "1024")
    monkeypatch.setenv("GRAFT_EXTRACT_CPU_FRACTION", "0.5")
    cfg = PipelineConfig.from_env()
    assert cfg.batch_size == 1024
    assert cfg.extract_cpu_fraction == 0.5
