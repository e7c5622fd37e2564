"""DDS reader tests: hand-built BC1/BC2/BC3 blocks with known decodes
(reference ingests DDS via dds::readFile, Source/Material.cpp:109-125;
here blocks are decoded at ingest for the unified float texture table)."""

import struct

import numpy as np
import pytest

from vri_tpu.utils import dds


def _header(width, height, fourcc=None, bitcount=32,
            masks=(0xFF, 0xFF00, 0xFF0000, 0xFF000000)):
    """Assemble a 128-byte DDS header."""
    if fourcc is not None:
        pf = struct.pack("<2I4s5I", 32, 0x4, fourcc, 0, 0, 0, 0, 0)
    else:
        flags = 0x40 | (0x1 if masks[3] else 0)
        pf = struct.pack("<2I4s5I", 32, flags, b"\0\0\0\0", bitcount,
                         *masks)
    head = struct.pack("<4s7I", b"DDS ", 124, 0x1007, height, width,
                       0, 0, 0)
    return head + b"\0" * 44 + pf + b"\0" * 20


def _c565(r, g, b):
    return ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)


class TestBC1:
    def test_solid_color(self, tmp_path):
        # c0 == c1 -> 3-color mode, but index 0 always = c0
        c = _c565(248, 120, 56)
        block = struct.pack("<HHI", c, c, 0)      # all texels index 0
        f = tmp_path / "solid.dds"
        f.write_bytes(_header(4, 4, b"DXT1") + block)
        img = dds.read_dds(str(f))
        assert img.shape == (4, 4, 4)
        np.testing.assert_array_equal(img[0, 0], [255, 121, 57, 255])
        assert (img == img[0, 0]).all()

    def test_interpolated_and_punch(self, tmp_path):
        white, black = _c565(255, 255, 255), _c565(0, 0, 0)
        # 4-color mode (c0 > c1): indices 0..3 in the first four texels
        words = 0b11100100            # texels 0,1,2,3 -> idx 0,1,2,3
        block = struct.pack("<HHI", white, black, words)
        f = tmp_path / "interp.dds"
        f.write_bytes(_header(4, 4, b"DXT1") + block)
        img = dds.read_dds(str(f))
        np.testing.assert_array_equal(img[0, 0, :3], [255, 255, 255])
        np.testing.assert_array_equal(img[0, 1, :3], [0, 0, 0])
        assert abs(int(img[0, 2, 0]) - 170) <= 1      # 2/3 white
        assert abs(int(img[0, 3, 0]) - 85) <= 1       # 1/3 white
        assert (img[..., 3] == 255).all()
        # 3-color mode (c0 <= c1): index 3 is transparent
        block = struct.pack("<HHI", black, white, 0b11 << 6)  # texel 3
        f2 = tmp_path / "punch.dds"
        f2.write_bytes(_header(4, 4, b"DXT1") + block)
        img2 = dds.read_dds(str(f2))
        assert img2[0, 3, 3] == 0 and img2[0, 0, 3] == 255

    def test_multi_block_layout(self, tmp_path):
        # 8x4: left block red, right block blue
        red = struct.pack("<HHI", _c565(255, 0, 0), _c565(255, 0, 0), 0)
        blue = struct.pack("<HHI", _c565(0, 0, 255), _c565(0, 0, 255), 0)
        f = tmp_path / "two.dds"
        f.write_bytes(_header(8, 4, b"DXT1") + red + blue)
        img = dds.read_dds(str(f))
        assert img.shape == (4, 8, 4)
        assert img[2, 1, 0] == 255 and img[2, 1, 2] == 0
        assert img[2, 6, 2] == 255 and img[2, 6, 0] == 0


class TestBC3:
    def test_alpha_ramp(self, tmp_path):
        # 8-alpha mode (a0 > a1): texels 0,1 use endpoints; 2 uses interp
        abits = 0 | (1 << 3) | (2 << 6)     # texel0 idx0, t1 idx1, t2 idx2
        ablock = struct.pack("<BB6s", 200, 40,
                             abits.to_bytes(6, "little"))
        c = _c565(16, 16, 16)
        cblock = struct.pack("<HHI", c, c, 0)
        f = tmp_path / "bc3.dds"
        f.write_bytes(_header(4, 4, b"DXT5") + ablock + cblock)
        img = dds.read_dds(str(f))
        assert img[0, 0, 3] == 200 and img[0, 1, 3] == 40
        assert img[0, 2, 3] == (6 * 200 + 1 * 40) // 7
        # 6-alpha mode: palette 6 -> 0, 7 -> 255
        abits = 6 | (7 << 3)
        ablock = struct.pack("<BB6s", 40, 200,
                             abits.to_bytes(6, "little"))
        f2 = tmp_path / "bc3b.dds"
        f2.write_bytes(_header(4, 4, b"DXT5") + ablock + cblock)
        img2 = dds.read_dds(str(f2))
        assert img2[0, 0, 3] == 0 and img2[0, 1, 3] == 255


class TestBC2:
    def test_explicit_alpha(self, tmp_path):
        # 4-bit alpha nibbles: texel0 = 0xF, texel1 = 0x8
        ablock = bytes([0x8F] + [0] * 7)
        c = _c565(128, 128, 128)
        cblock = struct.pack("<HHI", c, c, 0)
        f = tmp_path / "bc2.dds"
        f.write_bytes(_header(4, 4, b"DXT3") + ablock + cblock)
        img = dds.read_dds(str(f))
        assert img[0, 0, 3] == 255
        assert img[0, 1, 3] == (8 * 255) // 15
        assert img[0, 2, 3] == 0


class TestUncompressed:
    def test_bgra(self, tmp_path):
        px = np.zeros((2, 2, 4), np.uint8)
        px[..., 0] = 10    # B
        px[..., 1] = 20    # G
        px[..., 2] = 30    # R
        px[..., 3] = 40    # A
        f = tmp_path / "bgra.dds"
        f.write_bytes(_header(2, 2, None, 32,
                              (0xFF0000, 0xFF00, 0xFF, 0xFF000000))
                      + px.tobytes())
        img = dds.read_dds(str(f))
        np.testing.assert_array_equal(img[0, 0], [30, 20, 10, 40])

    def test_rgb24_opaque(self, tmp_path):
        px = np.zeros((2, 2, 3), np.uint8)
        px[..., 0] = 5     # R (mask 0xFF)
        px[..., 2] = 99    # B
        f = tmp_path / "rgb.dds"
        f.write_bytes(_header(2, 2, None, 24,
                              (0xFF, 0xFF00, 0xFF0000, 0)) + px.tobytes())
        img = dds.read_dds(str(f))
        np.testing.assert_array_equal(img[0, 0], [5, 0, 99, 255])


class TestIngest:
    def test_load_texture_dds(self, tmp_path):
        from vri_tpu.hydra.material import load_texture

        c = _c565(0, 248, 0)
        block = struct.pack("<HHI", c, c, 0)
        f = tmp_path / "green.dds"
        f.write_bytes(_header(4, 4, b"DXT1") + block)
        tex = load_texture(str(f), 8)
        assert tex.shape == (8, 8, 4)
        assert abs(tex[4, 4, 1] - 248 / 255) < 0.02
        assert tex[4, 4, 0] < 0.05 and tex[4, 4, 3] == 1.0

    def test_bad_magic_raises(self, tmp_path):
        f = tmp_path / "junk.dds"
        f.write_bytes(b"JUNKJUNKJUNK" * 20)
        with pytest.raises(dds.DdsError):
            dds.read_dds(str(f))
