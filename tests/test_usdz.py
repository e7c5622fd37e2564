"""usdz package round-trip: write, re-open, sync identically.

Reference behavior: ``UsdStage::Open`` accepts packages through the Ar
package resolver (Source/Main.cpp:33); here usd/usdz.py extracts the
archive and the file-anchored pipeline runs unchanged.
"""

import os
import zipfile

import numpy as np
import pytest

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.usd import scenes, usdz
from vri_tpu.usd.stage import Stage
from vri_tpu.usd.usda import UsdaError


def _sync(stage):
    d = RenderDelegate(RenderConfig(width=64, height=64))
    d.populate(stage)
    return d.sync()


class TestUsdz:
    def test_roundtrip_sync_identical(self, tmp_path):
        stage = scenes.kitchen_stress(num_objects=8, tess=2)
        pkg = str(tmp_path / "kitchen.usdz")
        stage.save(pkg)
        st2 = Stage.open(pkg)
        a = _sync(stage)
        b = _sync(st2)
        assert int(a.num_faces) == int(b.num_faces)
        assert int(a.num_instances) == int(b.num_instances)
        assert np.allclose(np.asarray(a.positions), np.asarray(b.positions),
                           atol=1e-5)
        assert np.array_equal(np.asarray(a.tri_vertices),
                              np.asarray(b.tri_vertices))

    def test_usda_root_layer(self, tmp_path):
        stage = scenes.cornell_box()
        pkg = str(tmp_path / "cornell.usdz")
        usdz.write(stage, pkg, layer_format="usda")
        st2 = Stage.open(pkg)
        b = _sync(st2)
        assert int(b.num_instances) == 8
        assert int(b.num_faces) == 36

    def test_alignment_and_stored(self, tmp_path):
        stage = scenes.cornell_box()
        pkg = str(tmp_path / "cornell.usdz")
        stage.save(pkg)
        with zipfile.ZipFile(pkg) as z:
            for info in z.infolist():
                assert info.compress_type == zipfile.ZIP_STORED
                # data offset = header_offset + 30 + name + extra
                data_off = (info.header_offset + 30
                            + len(info.filename.encode()) + len(info.extra))
                assert data_off % 64 == 0, (info.filename, data_off)

    def test_packages_textures(self, tmp_path):
        # a stage binding a texture file packages the asset and resolves
        # it back out of the extracted archive
        from vri_tpu.usd.scenes import _author_material, _author_mesh, box_mesh

        tex = tmp_path / "checker.png"
        from vri_tpu.utils.image import write_png
        img = np.zeros((8, 8, 3), np.float32)
        img[::2, ::2] = 1.0
        write_png(str(tex), img)

        from vri_tpu.usd.usda import Prim
        stage = Stage(Prim(name=""), {"defaultPrim": "World"},
                      anchor=str(tmp_path))
        stage.define_prim("/World", "Xform")
        _author_material(stage, "/World/M", (1, 1, 1),
                         texture="checker.png")
        pts, counts, idx, st_ = box_mesh((1, 1, 1), (0, 0, 0))
        _author_mesh(stage, "/World/Box", pts, counts, idx, st_,
                     material="/World/M")
        pkg = str(tmp_path / "tex.usdz")
        stage.save(pkg)
        with zipfile.ZipFile(pkg) as z:
            assert "checker.png" in z.namelist()
        st2 = Stage.open(pkg)
        s = _sync(st2)
        # texture decoded from inside the package -> a non-empty slot table
        assert s.textures.shape[0] == 1

    def test_zip_slip_rejected(self, tmp_path):
        pkg = str(tmp_path / "evil.usdz")
        with zipfile.ZipFile(pkg, "w") as z:
            z.writestr("../evil.usda", "#usda 1.0\n")
        with pytest.raises(UsdaError):
            Stage.open(pkg)

    def test_no_layer_rejected(self, tmp_path):
        pkg = str(tmp_path / "empty.usdz")
        with zipfile.ZipFile(pkg, "w") as z:
            z.writestr("readme.txt", "nothing here")
        with pytest.raises(UsdaError):
            Stage.open(pkg)
