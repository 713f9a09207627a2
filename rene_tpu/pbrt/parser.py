"""pbrt-v3 scene file parser.

A hand-written tokenizer + recursive-descent parser covering the same grammar
as the reference's chumsky combinators (/root/reference/pbrt-parser/src/lib.rs):

* comments (`# ...`), whitespace
* floats (``1``, ``2.25``, ``1e5``, ``.9``), integers, quoted strings with
  escapes, bools (``"true"``/``"false"``)
* bracketed lists, typed arguments (``"float fov" 45``, ``"rgb Kd" [...]``)
* pre-world directives: LookAt/Rotate/Scale/Translate/Transform/
  ConcatTransform, Camera/Sampler/Integrator/PixelFilter/Film
* world block: Texture, NamedMaterial, LightSource, AreaLightSource, Material,
  MakeNamedMaterial, MakeNamedMedium, Shape, ObjectInstance,
  CoordSysTransform, MediumInterface, ReverseOrientation,
  Attribute/Transform/Object Begin..End (recursive)

Argument type validation matches the reference (rgb length 3, blackbody pairs,
point/normal multiples of 3; `color` is an alias of `rgb`,
lib.rs:398).
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

from .ast import (Argument, AxisAngle, LookAt, Object, SceneStmt, TextureDecl,
                  Value, WorldStmt)


class ParseError(Exception):
    def __init__(self, msg: str, pos: int = -1, text: str = ""):
        self.pos = pos
        self.line, self.col = _line_col(text, pos) if pos >= 0 else (-1, -1)
        super().__init__(f"{msg} (line {self.line}, col {self.col})"
                         if pos >= 0 else msg)


def _line_col(text: str, pos: int) -> Tuple[int, int]:
    line = text.count("\n", 0, pos) + 1
    last_nl = text.rfind("\n", 0, pos)
    return line, pos - last_nl


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<lbracket>\[)
    | (?P<rbracket>\])
    | (?P<number>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {"\\": "\\", "/": "/", '"': '"', "b": "\x08", "f": "\x0c",
            "n": "\n", "r": "\r", "t": "\t"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind   # "string" | "number" | "ident" | "[" | "]"
        self.text = text
        self.pos = pos

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Token({self.kind!r}, {self.text!r})"


def tokenize(text: str) -> List[Token]:
    tokens: List[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ParseError(f"unexpected character {text[pos]!r}", pos, text)
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "string":
            tokens.append(Token("string", _unescape(m.group()[1:-1]), m.start()))
        elif kind == "number":
            tokens.append(Token("number", m.group(), m.start()))
        elif kind == "ident":
            tokens.append(Token("ident", m.group(), m.start()))
        elif kind == "lbracket":
            tokens.append(Token("[", "[", m.start()))
        elif kind == "rbracket":
            tokens.append(Token("]", "]", m.start()))
    return tokens


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_SCENE_OBJECTS = {"Camera", "Sampler", "Integrator", "PixelFilter", "Film"}
_WORLD_OBJECTS = {"LightSource", "AreaLightSource", "Material",
                  "MakeNamedMaterial", "MakeNamedMedium", "Shape"}
_ARG_TYPES = {"float", "bool", "integer", "string", "point", "normal",
              "texture", "blackbody", "rgb", "color", "spectrum",
              # common pbrt aliases kept lenient:
              "point3", "normal3", "point2", "vector", "vector3"}


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self) -> Optional[Token]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input", len(self.text), self.text)
        self.i += 1
        return t

    def expect(self, kind: str) -> Token:
        t = self.next()
        if t.kind != kind:
            raise ParseError(f"expected {kind}, got {t.kind} {t.text!r}",
                             t.pos, self.text)
        return t

    def number(self) -> float:
        return float(self.expect("number").text)

    def string(self) -> str:
        return self.expect("string").text

    def vec3(self) -> np.ndarray:
        return np.array([self.number(), self.number(), self.number()],
                        dtype=np.float32)

    def mat4(self) -> np.ndarray:
        """16 bracketed floats, pbrt column-major -> row-major math matrix."""
        self.expect("[")
        vals = [self.number() for _ in range(16)]
        self.expect("]")
        return np.array(vals, dtype=np.float32).reshape(4, 4).T

    # -- arguments ----------------------------------------------------------
    def _bracket_numbers(self) -> List[float]:
        self.expect("[")
        vals = []
        while self.peek() and self.peek().kind == "number":
            vals.append(float(self.next().text))
        self.expect("]")
        return vals

    def _number_or_list(self) -> List[float]:
        t = self.peek()
        if t and t.kind == "[":
            return self._bracket_numbers()
        return [self.number()]

    def _string_or_list(self) -> List[str]:
        t = self.peek()
        if t and t.kind == "[":
            self.next()
            vals = []
            while self.peek() and self.peek().kind == "string":
                vals.append(self.next().text)
            self.expect("]")
            return vals
        return [self.string()]

    def argument(self) -> Argument:
        decl = self.string()  # e.g. "float fov"
        parts = decl.split()
        if len(parts) != 2 or parts[0] not in _ARG_TYPES:
            raise ParseError(f"bad argument declaration {decl!r}",
                             self.toks[self.i - 1].pos, self.text)
        ty, name = parts
        tpos = self.toks[self.i - 1].pos
        if ty == "float":
            value = Value("float", self._number_or_list())
        elif ty == "integer":
            value = Value("integer", [int(v) for v in self._number_or_list()])
        elif ty == "bool":
            raw = self._string_or_list()
            value = Value("bool", [s == "true" for s in raw])
        elif ty in ("rgb", "color"):
            v = self._number_or_list()
            if len(v) != 3:
                raise ParseError(f"length of rgb must be 3. It was {len(v)}",
                                 tpos, self.text)
            value = Value("rgb", np.array(v, dtype=np.float32))
        elif ty == "blackbody":
            v = self._number_or_list()
            if len(v) % 2 != 0:
                raise ParseError(
                    f"length of blackbody value must be multiple of 2. "
                    f"It was {len(v)}", tpos, self.text)
            value = Value("blackbody",
                          np.array(v, dtype=np.float32).reshape(-1, 2))
        elif ty in ("point", "point3", "vector", "vector3"):
            v = self._number_or_list()
            if len(v) % 3 != 0:
                raise ParseError(
                    f"length of point value must be multiple of 3. "
                    f"It was {len(v)}", tpos, self.text)
            value = Value("point", np.array(v, dtype=np.float32).reshape(-1, 3))
        elif ty in ("normal", "normal3"):
            v = self._number_or_list()
            if len(v) % 3 != 0:
                raise ParseError(
                    f"length of normal value must be multiple of 3. "
                    f"It was {len(v)}", tpos, self.text)
            value = Value("normal",
                          np.array(v, dtype=np.float32).reshape(-1, 3))
        elif ty == "point2":
            value = Value("float", self._number_or_list())
        elif ty == "string":
            value = Value("string", self._string_or_list())
        elif ty == "texture":
            value = Value("texture", self._string_or_list())
        elif ty == "spectrum":
            # reference accepts a single (unbracketed) filename string
            value = Value("spectrum", self.string())
        else:  # pragma: no cover
            raise ParseError(f"unhandled argument type {ty}", tpos, self.text)
        return Argument(name, value)

    def arguments(self) -> List[Argument]:
        args = []
        while True:
            t = self.peek()
            if t is None or t.kind != "string":
                return args
            args.append(self.argument())

    # -- directives ---------------------------------------------------------
    def parse_scene(self) -> List[SceneStmt]:
        stmts: List[SceneStmt] = []
        while self.peek() is not None:
            t = self.expect("ident")
            name = t.text
            if name == "LookAt":
                stmts.append(SceneStmt("look_at",
                                       LookAt(self.vec3(), self.vec3(),
                                              self.vec3())))
            elif name == "Rotate":
                angle = self.number()
                stmts.append(SceneStmt("rotate", AxisAngle(self.vec3(), angle)))
            elif name == "Scale":
                stmts.append(SceneStmt("scale", self.vec3()))
            elif name == "Translate":
                stmts.append(SceneStmt("translate", self.vec3()))
            elif name == "Transform":
                stmts.append(SceneStmt("transform", self.mat4()))
            elif name == "ConcatTransform":
                stmts.append(SceneStmt("concat", self.mat4()))
            elif name in _SCENE_OBJECTS:
                subtype = self.string()
                stmts.append(SceneStmt(
                    "object", Object(name, subtype, self.arguments())))
            elif name == "WorldBegin":
                stmts.append(SceneStmt("world", self.parse_worlds("WorldEnd")))
            else:
                raise ParseError(f"unknown directive {name!r}", t.pos,
                                 self.text)
        return stmts

    def parse_worlds(self, terminator: str) -> List[WorldStmt]:
        stmts: List[WorldStmt] = []
        while True:
            t = self.peek()
            if t is None:
                raise ParseError(f"missing {terminator}", len(self.text),
                                 self.text)
            if t.kind != "ident":
                raise ParseError(f"expected directive, got {t.text!r}",
                                 t.pos, self.text)
            name = t.text
            if name == terminator:
                self.next()
                return stmts
            self.next()
            if name in _WORLD_OBJECTS:
                subtype = self.string()
                stmts.append(WorldStmt(
                    "object", Object(name, subtype, self.arguments())))
            elif name == "Texture":
                tname = self.string()
                vtype = self.string()
                cls = self.string()
                stmts.append(WorldStmt("texture", TextureDecl(
                    tname, vtype, Object("Texture", cls, self.arguments()))))
            elif name == "NamedMaterial":
                stmts.append(WorldStmt("named_material", self.string()))
            elif name == "ObjectInstance":
                stmts.append(WorldStmt("object_instance", self.string()))
            elif name == "CoordSysTransform":
                stmts.append(WorldStmt("coord_sys_transform", self.string()))
            elif name == "MediumInterface":
                stmts.append(WorldStmt("medium_interface",
                                       (self.string(), self.string())))
            elif name == "ReverseOrientation":
                stmts.append(WorldStmt("reverse_orientation"))
            elif name == "Transform":
                stmts.append(WorldStmt("transform", self.mat4()))
            elif name == "ConcatTransform":
                stmts.append(WorldStmt("concat", self.mat4()))
            elif name == "Translate":
                stmts.append(WorldStmt("translate", self.vec3()))
            elif name == "Scale":
                stmts.append(WorldStmt("scale", self.vec3()))
            elif name == "Rotate":
                angle = self.number()
                stmts.append(WorldStmt("rotate", AxisAngle(self.vec3(), angle)))
            elif name == "AttributeBegin":
                stmts.append(WorldStmt("attribute",
                                       self.parse_worlds("AttributeEnd")))
            elif name == "TransformBegin":
                # The reference maps TransformBegin..End to the same node as
                # AttributeBegin (full state save/restore), lib.rs:561-566.
                stmts.append(WorldStmt("attribute",
                                       self.parse_worlds("TransformEnd")))
            elif name == "ObjectBegin":
                oname = self.string()
                stmts.append(WorldStmt("object_block",
                                       (oname, self.parse_worlds("ObjectEnd"))))
            else:
                raise ParseError(f"unknown world directive {name!r}", t.pos,
                                 self.text)


def parse_pbrt(text: str) -> List[SceneStmt]:
    """Parse a full pbrt file (after Include expansion) into AST statements."""
    return _Parser(text).parse_scene()
