"""Parser unit tests.

Ports the reference's 10 parser test cases
(/root/reference/pbrt-parser/src/lib.rs:579-711) to the rene_tpu grammar,
plus smoke tests over the shipped sample scenes.
"""
import numpy as np
import pytest

from rene_tpu.pbrt import ParseError, parse_pbrt, tokenize
from rene_tpu.pbrt.parser import _Parser


def test_comment():
    assert tokenize("# Hello") == []


def test_sp():
    # comments + whitespace in any mix tokenize to nothing
    assert tokenize("# Hello\n   \n") == []
    assert tokenize("# hello\n        # world") == []
    assert tokenize("\n   \n") == []
    assert tokenize(" ") == []
    assert tokenize("") == []


def test_float():
    def f(s):
        return _Parser(s).number()

    assert f("1") == 1.0
    assert f("2.25") == 2.25
    assert f("1e5") == 1e5
    assert f("1e-5") == 1e-5
    assert f(".9") == pytest.approx(0.9)


def test_integer():
    def i(s):
        return int(_Parser(s).number())

    assert i("1") == 1
    assert i("114514") == 114514
    assert i("-200") == -200


def test_string():
    assert _Parser('"TEST"').string() == "TEST"


def test_parse_vec4_with_comments():
    p = _Parser("""1 # this is 1
                # aaa
                2 # this is 2
                3
                4""")
    vals = [p.number() for _ in range(4)]
    assert vals == [1.0, 2.0, 3.0, 4.0]


def test_parse_argument():
    a = _Parser('"string test" "OK"').argument()
    assert a.name == "test"
    assert a.value.kind == "string" and a.value.data == ["OK"]

    a = _Parser('"float test" [1 2 3]').argument()
    assert a.name == "test"
    assert a.value.kind == "float" and a.value.data == [1.0, 2.0, 3.0]

    a = _Parser('"rgb Kd" [ .7 .2 .2 ]').argument()
    assert a.name == "Kd"
    assert a.value.kind == "rgb"
    np.testing.assert_allclose(a.value.data, [0.7, 0.2, 0.2], rtol=1e-6)


def test_world():
    src = '''LightSource "infinite" "rgb L" [.4 .45 .5]
WorldEnd'''
    stmts = _Parser(src).parse_worlds("WorldEnd")
    assert len(stmts) == 1
    assert stmts[0].kind == "object"
    assert stmts[0].payload.object_type == "LightSource"
    assert stmts[0].payload.t == "infinite"


def test_world_statement():
    src = """WorldBegin
# uniform blue-ish illumination from all directions
LightSource "infinite" "rgb L" [.4 .45 .5]

AttributeBegin
  Material "matte" "rgb Kd" [ .7 .2 .2 ]
  Shape "sphere" "float radius" 1
AttributeEnd

WorldEnd
        """
    stmts = parse_pbrt(src)
    assert len(stmts) == 1
    world = stmts[0].payload
    assert stmts[0].kind == "world"
    assert world[1].kind == "attribute"
    assert len(world[1].payload) == 2


def test_sphere_scene():
    src = """
LookAt 3 4 1.5  # eye
       .0 .0 0  # look at point
       0 0 1    # up vector
Camera "perspective" "float fov" 45

WorldBegin

# uniform blue-ish illumination from all directions
LightSource "infinite" "rgb L" [.4 .45 .5]

AttributeBegin
  Material "matte" "rgb Kd" [ .7 .2 .2 ]
  Shape "sphere" "float radius" 1
AttributeEnd

WorldEnd
        """
    stmts = parse_pbrt(src)
    kinds = [s.kind for s in stmts]
    assert kinds == ["look_at", "object", "world"]
    la = stmts[0].payload
    np.testing.assert_allclose(la.eye, [3, 4, 1.5])
    np.testing.assert_allclose(la.up, [0, 0, 1])


def test_transform_column_major():
    # pbrt Transform lists 16 values column-major; our AST stores M@p row-major
    stmts = parse_pbrt(
        "Transform [ 1 0 0 0  0 1 0 0  0 0 1 0  5 6 7 1] WorldBegin WorldEnd")
    m = stmts[0].payload
    np.testing.assert_allclose(m[:3, 3], [5, 6, 7])
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])


def test_rgb_length_validation():
    with pytest.raises(ParseError):
        parse_pbrt('Camera "perspective" "rgb x" [1 2]')


def test_bool_argument():
    a = _Parser('"bool remaproughness" [ "false" ]').argument()
    assert a.value.kind == "bool" and a.value.data == [False]


def test_object_instance_block():
    src = """WorldBegin
ObjectBegin "tree"
  Shape "sphere" "float radius" 1
ObjectEnd
ObjectInstance "tree"
WorldEnd"""
    world = parse_pbrt(src)[0].payload
    assert world[0].kind == "object_block"
    name, inner = world[0].payload
    assert name == "tree" and len(inner) == 1
    assert world[1].kind == "object_instance"


def test_sample_scenes_parse(sample_scenes):
    for rel in ["sphere.pbrt", "cube.pbrt", "current.pbrt",
                "cornell-box/scene.pbrt", "veach-mis/scene.pbrt",
                "dragon/scene.pbrt", "teapot/scene.pbrt"]:
        text = (sample_scenes / rel).read_text()
        stmts = parse_pbrt(text)
        assert any(s.kind == "world" for s in stmts), rel


# -- span-labeled diagnostics (reference: ariadne reports, main.rs:129-190)

def _report(src):
    try:
        parse_pbrt(src)
    except ParseError as e:
        return e.render("scene.pbrt")
    raise AssertionError("expected ParseError")


def test_report_unclosed_attribute_block():
    src = ('WorldBegin\n'
           'AttributeBegin\n'
           '  Shape "sphere" "float radius" 1\n'
           'WorldEnd\n')
    rep = _report(src)
    # the missing closer is reported against the outer closer (no
    # unknown-directive cascade) with a hint at the unclosed opener
    assert "missing AttributeEnd" in rep
    assert "--> scene.pbrt:" in rep
    assert "^" in rep and "expected AttributeEnd before 'WorldEnd'" in rep
    assert "unclosed delimiter 'AttributeBegin'" in rep


def test_report_unclosed_bracket_hint():
    src = ('Camera "perspective" "float fov" [ 45\n'
           'WorldBegin WorldEnd\n')
    rep = _report(src)
    lines = rep.splitlines()
    assert lines[0].startswith("error: expected ]")
    # primary label at the unexpected token, hint label at the opener
    assert any("unexpected token 'WorldBegin'" in ln for ln in lines)
    assert any("unclosed delimiter '['" in ln and "-" in ln
               for ln in lines)
    # both labels carry their source excerpt
    assert any('[ 45' in ln for ln in lines)


def test_report_missing_worldend_points_at_opener():
    src = 'WorldBegin\nShape "sphere" "float radius" 1\n'
    rep = _report(src)
    assert "error: missing WorldEnd" in rep
    assert "unexpected end of input" in rep
    assert "unclosed delimiter 'WorldBegin'" in rep
    # the hint label excerpts line 1 with the opener underlined
    lines = rep.splitlines()
    k = next(i for i, ln in enumerate(lines) if "unclosed" in ln)
    assert lines[k - 1].startswith("1 | WorldBegin")


def test_report_unknown_directive_excerpt():
    rep = _report('LookAtt 0 0 0  0 0 1  0 1 0\nWorldBegin WorldEnd')
    assert "error: unknown directive 'LookAtt'" in rep
    assert "^^^^^^^ unexpected token 'LookAtt'" in rep


def test_multi_error_recovery():
    """Directive-level recovery reports SEVERAL labeled errors per run,
    like the reference's chumsky parse_recovery (rene/src/main.rs:126-196):
    two seeded errors yield two rendered reports."""
    from rene_tpu.pbrt.parser import MultiParseError, parse_pbrt

    src = ('Film "image" "integer xresolution" [8]\n'
           'Kamera "perspective"\n'
           'WorldBegin\n'
           'Material "matte" "rgb Kd" [.7 .2]\n'
           'Shape "sphere" "float radius" 1\n'
           'WorldEnd\n')
    try:
        parse_pbrt(src)
        raise AssertionError("expected MultiParseError")
    except MultiParseError as e:
        assert len(e.errors) == 2
        rep = e.render("scene.pbrt")
        assert "unknown directive 'Kamera'" in rep
        assert "length of rgb must be 3" in rep
        assert rep.count("--> scene.pbrt:") == 2

    # recovery resumes INSIDE blocks: the shape after the bad material
    # still parses, so a single error stays a plain ParseError
    from rene_tpu.pbrt.parser import ParseError
    one = ('WorldBegin\n'
           'Material "matte" "rgb Kd" [.7 .2]\n'
           'Shape "sphere" "float radius" 1\n'
           'WorldEnd\n')
    try:
        parse_pbrt(one)
        raise AssertionError("expected ParseError")
    except MultiParseError:
        raise AssertionError("single error must not be wrapped")
    except ParseError as e:
        assert "length of rgb" in e.msg

    # cascade cap: a flood of errors aborts at the bound
    from rene_tpu.pbrt.parser import MAX_PARSE_ERRORS
    flood = "WorldBegin\n" + 'Material "matte" "rgb Kd" [1 2]\n' * 40 \
        + "WorldEnd\n"
    try:
        parse_pbrt(flood)
        raise AssertionError("expected MultiParseError")
    except MultiParseError as e:
        assert len(e.errors) == MAX_PARSE_ERRORS
