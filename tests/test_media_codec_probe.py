"""Codec capability probe + decode dispatch (r07 verdict item 7): the
stub/real split in operators/multimodal.py is only honest if the flip
path is itself tested — so these tests inject fake codec modules and
prove that (a) the probe detects them, (b) ``_decode`` routes decodable
payloads through the real codec, and (c) non-decodable payloads (the
synthetic text-byte fixtures) still fall back to the deterministic fake,
which is what keeps every media gate oracle-replayable either way."""

from __future__ import annotations

import sys
import types

import pytest

from kafka_connect_hdfs_spark.operators import multimodal as M


def test_probe_reports_sandbox_reality():
    caps = M.codec_capabilities()
    assert set(caps) == {"image", "audio", "video"}
    # the container ships no codec libraries; if one appears, the module
    # constant must have flipped with it
    assert M.STUB_DECODERS_REAL == any(M._CAPS.values())


def test_fake_decode_is_deterministic_per_payload():
    assert M._fake_decode("image", b"x" * 10) == M._fake_decode("image", b"y" * 10)
    w, h, f = M._fake_decode("video", b"abc")
    assert (w, h, f) == (4, 4, 4)
    assert M._fake_decode("audio", b"") == (0, 0, 1)


def test_decode_uses_real_codec_when_probe_flips(monkeypatch):
    """Inject a fake PIL that decodes a magic payload: _decode must route
    through it (probe on + payload decodable) and fall back to the fake
    for anything it cannot open — the documented drop-in contract."""

    class _Img:
        width, height, n_frames = 320, 200, 1

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _ImageMod(types.ModuleType):
        @staticmethod
        def open(buf):
            if buf.read(4) != b"MAGI":
                raise ValueError("not an image")
            return _Img()

    pil = types.ModuleType("PIL")
    pil.Image = _ImageMod("PIL.Image")
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil.Image)
    monkeypatch.setitem(M._CAPS, "image", True)

    # decodable payload -> real codec dimensions
    assert M._decode("image", b"MAGIC-BYTES") == (320, 200, 1)
    # non-decodable payload -> deterministic fake (oracle stays replayable)
    assert M._decode("image", b"plain text") == M._fake_decode(
        "image", b"plain text"
    )


def test_decode_without_capability_never_imports_codec(monkeypatch):
    """With the capability off, _decode must not attempt an import even if
    a module of that name exists (the fake path is the contract)."""
    sentinel = types.ModuleType("soundfile")

    def _boom(*a, **k):  # pragma: no cover - must not be called
        raise AssertionError("codec touched with capability off")

    sentinel.info = _boom
    monkeypatch.setitem(sys.modules, "soundfile", sentinel)
    monkeypatch.setitem(M._CAPS, "audio", False)
    assert M._decode("audio", b"12345") == M._fake_decode("audio", b"12345")
