"""Semantics tests for the media_resize driver query: real PPM
decode -> nearest-neighbor resample -> re-encode, deterministic crc
signatures, audio rows excluded, dimensions honored.
"""

from __future__ import annotations

import importlib.util
import zlib

import numpy as np

from htmlparsersharp_ray.stages.multimodal import (
    ImageResizeUDF,
    decode_ppm,
    encode_ppm,
    synth_media_table,
)


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry___mr", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestMediaResize:
    def test_query_resizes_all_images(self, ray_session):
        out = _entry().queries()["media_resize"]("unused")
        t = synth_media_table(200)
        n_images = sum(1 for k in t.column("kind").to_pylist()
                       if k == "image")
        assert len(out) == n_images
        assert (out["out_w"] == 16).all()
        assert (out["out_h"] == 12).all()
        assert list(out.columns) == ["media_id", "out_w", "out_h",
                                     "payload_crc"]

    def test_crc_matches_sequential_reference(self, ray_session):
        out = _entry().queries()["media_resize"]("unused")
        t = synth_media_table(200)
        udf = ImageResizeUDF(width=16, height=12, fake=False)
        want = {}
        for mid, kind, payload in zip(t.column("media_id").to_pylist(),
                                      t.column("kind").to_pylist(),
                                      t.column("payload").to_pylist()):
            if kind == "image":
                want[mid] = zlib.crc32(udf._resize(payload))
        got = dict(zip(out["media_id"], out["payload_crc"]))
        assert got == want

    def test_resized_pixels_are_nearest_neighbor(self):
        px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        udf = ImageResizeUDF(width=3, height=2, fake=False)
        small = decode_ppm(udf._resize(encode_ppm(px)))
        assert small.shape == (2, 3, 3)
        yy = np.minimum((np.arange(2) * 4) // 2, 3)
        xx = np.minimum((np.arange(3) * 6) // 3, 5)
        assert (small == px[yy][:, xx]).all()
