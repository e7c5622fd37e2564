"""Stage model on top of the USDA parser.

Plays the role of ``UsdStage`` + ``UsdImagingDelegate`` scene access in the
reference (Source/Main.cpp:33-46): opening a stage, resolving prim transforms,
and answering the queries the Hydra-style sync layer makes (points, topology,
primvars, material bindings, camera parameters).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from vri_tpu.usd import usda
from vri_tpu.usd.usda import Attribute, Prim, PrimPathRef
from vri_tpu.utils import math3d


class Stage:
    """An opened USD-lite stage.

    ``Stage.open(path)`` / ``Stage.from_string(text)`` parse USDA;
    procedural builders construct prims directly and wrap them.
    """

    def __init__(self, root: Prim, metadata: Optional[Dict[str, Any]] = None,
                 anchor: str = ""):
        self.root = root
        self.metadata = metadata or {}
        #: directory used to resolve relative asset paths (textures)
        self.anchor = anchor
        self._index: Dict[str, Prim] = {}
        self._reindex()

    # -- constructors ------------------------------------------------------

    @classmethod
    def open(cls, path: str) -> "Stage":
        with open(path, "r") as f:
            text = f.read()
        root, meta = usda.parse_usda(text)
        return cls(root, meta, anchor=os.path.dirname(os.path.abspath(path)))

    @classmethod
    def from_string(cls, text: str, anchor: str = "") -> "Stage":
        root, meta = usda.parse_usda(text)
        return cls(root, meta, anchor=anchor)

    def export(self) -> str:
        return usda.write_usda(self.root, self.metadata)

    # -- prim access -------------------------------------------------------

    def _reindex(self) -> None:
        self._index.clear()
        for p in self.root.traverse():
            if p.name:
                self._index[p.path] = p

    def prim_at_path(self, path: str) -> Optional[Prim]:
        return self._index.get(path)

    def traverse(self) -> Iterator[Prim]:
        for p in self.root.traverse():
            if p.name:
                yield p

    def prims_of_type(self, type_name: str) -> List[Prim]:
        return [p for p in self.traverse() if p.type_name == type_name]

    # -- computed queries --------------------------------------------------

    def local_transform(self, prim: Prim) -> np.ndarray:
        """Resolve the prim's local transform from its xformOps.

        Supports the op set our writer and common exporters emit:
        ``xformOp:transform`` (matrix4d), ``:translate``, ``:scale``,
        ``:rotateX/Y/Z`` and ``:rotateXYZ`` (degrees), applied in
        ``xformOpOrder``.  USD matrix4d is row-major with *row-vector*
        convention (p' = p @ M); we transpose into our column-vector world.
        """
        order = prim.get("xformOpOrder")
        if order is None:
            order = [n for n in prim.attributes if n.startswith("xformOp:")]
        m = np.eye(4, dtype=np.float32)
        for op_name in order:
            op = str(op_name)
            a = prim.attributes.get(op)
            if a is None or a.value is None:
                continue
            v = a.value
            if op.startswith("xformOp:transform"):
                om = np.asarray(v, np.float64).reshape(4, 4).T.astype(np.float32)
            elif op.startswith("xformOp:translate"):
                om = math3d.translate(np.asarray(v, np.float32))
            elif op.startswith("xformOp:scale"):
                om = math3d.scale(np.asarray(v, np.float32))
            elif op.startswith("xformOp:rotateXYZ"):
                r = np.deg2rad(np.asarray(v, np.float64))
                om = (math3d.rotate_z(r[2]) @ math3d.rotate_y(r[1]) @
                      math3d.rotate_x(r[0]))
            elif op.startswith("xformOp:rotateX"):
                om = math3d.rotate_x(math.radians(float(v)))
            elif op.startswith("xformOp:rotateY"):
                om = math3d.rotate_y(math.radians(float(v)))
            elif op.startswith("xformOp:rotateZ"):
                om = math3d.rotate_z(math.radians(float(v)))
            else:
                continue
            m = m @ om
        return m

    def world_transform(self, prim: Prim) -> np.ndarray:
        """Concatenated local-to-world transform (like
        ``UsdGeomXformable::ComputeLocalToWorldTransform``)."""
        chain: List[Prim] = []
        p: Optional[Prim] = prim
        while p is not None and p.name:
            chain.append(p)
            p = p.parent
        m = np.eye(4, dtype=np.float32)
        for p in reversed(chain):
            m = m @ self.local_transform(p)
        return m

    def bound_material(self, prim: Prim) -> Optional[Prim]:
        """Resolve ``rel material:binding`` (reference reads the bound
        material id as a hash — Source/Mesh.cpp:106)."""
        rel = prim.attributes.get("material:binding")
        if rel is None or rel.value is None:
            # inherit from ancestors, as USD binding resolution does
            if prim.parent is not None and prim.parent.name:
                return self.bound_material(prim.parent)
            return None
        target = rel.value
        if isinstance(target, list):
            target = target[0] if target else None
        if isinstance(target, PrimPathRef):
            target = target.path
        return self.prim_at_path(str(target)) if target else None

    def resolve_asset(self, asset_path: str) -> str:
        if os.path.isabs(asset_path) or not self.anchor:
            return asset_path
        return os.path.join(self.anchor, asset_path)

    # -- authoring helpers (procedural scenes, animation) ------------------

    def define_prim(self, path: str, type_name: str = "") -> Prim:
        parts = [p for p in path.split("/") if p]
        node = self.root
        for i, name in enumerate(parts):
            child = node.child(name)
            if child is None:
                child = Prim(name=name, parent=node,
                             type_name=type_name if i == len(parts) - 1 else "Xform")
                node.children.append(child)
            node = child
        if type_name and not node.type_name:
            node.type_name = type_name
        self._reindex()
        return node

    def set_attr(self, prim: Prim, name: str, type_name: str, value,
                 uniform: bool = False, **metadata) -> Attribute:
        a = prim.attributes.get(name) or Attribute(name=name)
        a.type_name, a.value, a.uniform = type_name, value, uniform
        a.metadata.update(metadata)
        prim.attributes[name] = a
        return a
