"""usdc (crate) structural reader: bootstrap, TOC, TOKENS, lz4 block.

The reference reads crate through OpenUSD's Sdf_CrateFile
(pxr/usd/sdf/crateFile.cpp); these tests exercise the native structural
tier against handcrafted files following the documented layout (no pxr in
this environment to generate real ones).
"""

import struct

import pytest

from vri_tpu.usd import usdc
from vri_tpu.usd.stage import Stage


def _lz4_literal_block(data: bytes) -> bytes:
    """A valid all-literal LZ4 block (token 0xF0 + extended length)."""
    n = len(data)
    if n < 15:
        return bytes([n << 4]) + data
    out = bytearray([0xF0])
    rem = n - 15
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)
    out.extend(data)
    return bytes(out)


def _crate(tmp_path, version, tokens, compressed):
    blob = b"\x00".join(t.encode() for t in tokens) + b"\x00"
    if compressed:
        comp = b"\x01" + _lz4_literal_block(blob)
        body = struct.pack("<QQQ", len(tokens), len(blob), len(comp)) + comp
    else:
        body = struct.pack("<Q", len(tokens)) + blob
    boot = b"PXR-USDC" + bytes(version) + b"\x00" * 5
    # sections: TOKENS only; TOC after the section payload
    tokens_start = 88
    toc_off = tokens_start + len(body)
    boot += struct.pack("<Q", toc_off) + b"\x00" * 64
    assert len(boot) == 88
    toc = struct.pack("<Q", 1)
    toc += b"TOKENS".ljust(16, b"\x00") + struct.pack(
        "<QQ", tokens_start, len(body))
    p = tmp_path / "stage.usdc"
    p.write_bytes(boot + body + toc)
    return str(p)


class TestCrateReader:
    def test_uncompressed_tokens(self, tmp_path):
        toks = ["", "points", "faceVertexIndices", "Xform", "/World"]
        path = _crate(tmp_path, (0, 3, 0), toks, compressed=False)
        info = usdc.read_info(path)
        assert info.version == (0, 3, 0)
        assert [s[0] for s in info.sections] == ["TOKENS"]
        assert info.tokens == toks

    def test_lz4_tokens(self, tmp_path):
        toks = ["", "points", "primvars:st", "UsdPreviewSurface"] * 20
        path = _crate(tmp_path, (0, 8, 0), toks, compressed=True)
        info = usdc.read_info(path)
        assert info.version == (0, 8, 0)
        assert info.tokens == toks

    def test_lz4_matches_roundtrip(self):
        """Exercise real LZ4 matches (not just literals) in the decoder."""
        import ctypes

        lib = usdc._lib()
        if lib is None:
            pytest.skip("native lib unavailable")
        # hand-assembled block: 4 literals "abcd", then a match of length 8
        # at offset 4 (= "abcdabcd"), then 2 literals "xy"
        block = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) \
            + bytes([0x20]) + b"xy"
        out = (ctypes.c_ubyte * 64)()
        lib.vri_lz4_decompress_block.restype = ctypes.c_long
        n = lib.vri_lz4_decompress_block(block, len(block), out, 64)
        assert bytes(out[:n]) == b"abcd" + b"abcdabcd" + b"xy"

    def test_stage_open_structured_error(self, tmp_path):
        path = _crate(tmp_path, (0, 8, 0), ["", "points"], compressed=True)
        with pytest.raises(usdc.UsdcUnsupported) as e:
            Stage.open(path)
        assert e.value.info.version == (0, 8, 0)
        assert "TOKENS" in str(e.value)

    def test_not_a_crate(self, tmp_path):
        p = tmp_path / "junk.usdc"
        p.write_bytes(b"JUNKJUNKJUNK")
        assert not usdc.is_crate(str(p))
        with pytest.raises(usdc.UsdcError):
            usdc.read_info(str(p))
