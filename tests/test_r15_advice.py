"""Round-15 ADVICE/VERDICT regression tests (non-plan ones)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_io_codec_env_resolved_at_session_build(monkeypatch):
    """ADVICE r14: SPARK_GRAFT_IO_CODEC must be read when the session is
    BUILT, not when session.py is imported — setting it programmatically
    after import (as a deploy wrapper would) must take effect."""
    from praw_etl_student_dropout_spark.session import ENGINE_CONF, _env_conf

    # the import-time dict carries only the neutral default
    assert ENGINE_CONF["spark.io.compression.codec"] == "lz4"
    monkeypatch.setenv("SPARK_GRAFT_IO_CODEC", "zstd")
    assert _env_conf()["spark.io.compression.codec"] == "zstd"
    monkeypatch.delenv("SPARK_GRAFT_IO_CODEC")
    assert _env_conf()["spark.io.compression.codec"] == "lz4"
