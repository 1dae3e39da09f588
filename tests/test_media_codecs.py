"""Import-gated real media codecs (VERDICT r3 #8): the decode_stub=False
seams take the REAL PIL path the moment Pillow imports — proven here by
injecting a fake PIL module — and keep the explicit NotImplementedError
seam when it doesn't. No Spark needed: the gate and codec helpers are plain
functions the Arrow UDF calls per batch (worker-side the same import guard
runs, so a cluster with Pillow installed flips over with no code change)."""

from __future__ import annotations

import sys
import types

import pytest

from deepcrawl4ai_spark.multimodal import media as M


class _FakeImg:
    def __init__(self, size=(100, 50), lum=128):
        self.size = size
        self._lum = lum
        self.resized_to = None

    def convert(self, mode):
        return self

    def resize(self, wh):
        self.resized_to = wh
        return _FakeImg(size=wh, lum=self._lum)

    def tobytes(self):
        return bytes([self._lum]) * (self.size[0] * self.size[1])

    def save(self, buf, format="PNG"):
        buf.write(b"FAKEPNG:" + format.encode() + b":%dx%d" % self.size)


@pytest.fixture()
def fake_pil(monkeypatch):
    opened = []

    def _open(bio):
        opened.append(bio.read())
        return _FakeImg()

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = _open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)
    yield opened


def test_pil_gate_closed_in_container():
    # no Pillow here: the guard is honest and the seam raises
    if "PIL" not in sys.modules:
        assert not M._pil_available()


def test_real_image_features_via_fake_pil(fake_pil):
    assert M._pil_available()
    payload = b"\x89PNG-not-really" * 10
    feats = M._pil_image_features(payload)
    assert fake_pil and fake_pil[0] == payload  # PIL.Image.open really ran
    assert len(feats) == M.FEATURE_DIM
    assert feats[1] == pytest.approx(100 / 50)  # aspect from the fake decode
    # 8×8 thumbnail, uniform luminance 128 → all mass in one histogram bin
    bins = feats[2:]
    assert sum(1 for b in bins if b > 0) == 1
    assert sum(bins) == pytest.approx(1.0)


def test_real_resize_via_fake_pil(fake_pil):
    payload, nw, nh = M._pil_resize(b"imagebytes", max_side=32)
    assert payload.startswith(b"FAKEPNG:PNG")
    # 100×50 → scale 32/100: aspect preserved
    assert (nw, nh) == (32, 16)


def test_stub_paths_unchanged_by_gate():
    # the deterministic stub path ignores PIL entirely (golden tests rely on
    # byte-stable fake features)
    f1 = M._fake_decode_features(b"payload")
    f2 = M._fake_decode_features(b"payload")
    assert f1 == f2 and len(f1) == M.FEATURE_DIM
