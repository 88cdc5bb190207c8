"""Native frame-pipe tests (C++ build + round trip through child processes)."""

import shutil
import sys

import numpy as np
import pytest

from controlanimate_tpu.io import native

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_builds_and_loads():
    assert native.native_available()


def test_reader_roundtrip():
    """Child produces 5 deterministic 8x8 frames on stdout."""
    w = h = 8
    producer = [
        sys.executable, "-c",
        "import sys,numpy as np\n"
        "for i in range(5):\n"
        "    sys.stdout.buffer.write(np.full((8,8,3), i, np.uint8).tobytes())\n",
    ]
    src = native.NativeFrameSource(producer, w, h, capacity=4)
    frames = []
    while True:
        f = src.read()
        if f is None:
            break
        frames.append(f)
    src.close()
    assert len(frames) == 5
    for i, f in enumerate(frames):
        assert f.shape == (8, 8, 3)
        assert int(f[0, 0, 0]) == i


def test_writer_roundtrip(tmp_path):
    """Child consumes frames from stdin and copies them to a file."""
    w = h = 8
    out_file = tmp_path / "frames.bin"
    consumer = [
        sys.executable, "-c",
        "import sys, shutil\n"
        f"shutil.copyfileobj(sys.stdin.buffer, open(r'{out_file}', 'wb'))\n",
    ]
    sink = native.NativeFrameSink(consumer, w, h, capacity=4)
    for i in range(7):
        sink.write(np.full((h, w, 3), i, np.uint8))
    rc = sink.close()
    assert rc == 0
    data = np.frombuffer(out_file.read_bytes(), np.uint8).reshape(7, h, w, 3)
    for i in range(7):
        assert int(data[i, 0, 0, 0]) == i


def test_reader_eof_and_close_idempotence():
    producer = [sys.executable, "-c", "pass"]  # produces nothing
    src = native.NativeFrameSource(producer, 4, 4, capacity=2)
    assert src.read() is None
    src.close()
    src.close()  # second close is a no-op
