import pyarrow as pa
import pytest

from snowball_java_ray.functions.text import sha256_hex
from snowball_java_ray.pipelines.api import verify_sha_batch


def test_sha_guard_passes_on_intact_rows():
    t = pa.table(
        {"content": ["a", "b"], "content_sha256": sha256_hex(["a", "b"])}
    )
    assert verify_sha_batch(t) is t


def test_sha_guard_raises_on_corruption():
    t = pa.table(
        {"content": ["a", "TAMPERED"], "content_sha256": sha256_hex(["a", "b"])}
    )
    with pytest.raises(ValueError, match="content_sha256 mismatch"):
        verify_sha_batch(t)
