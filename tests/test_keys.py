"""Key machinery tests (reference: testSymbol/testLabeledSymbol/testEdgeKey,
gtsam/inference/tests/testKey.cpp)."""

from gtsam_personal_tpu.core.keys import (EdgeKey, LabeledSymbol, Symbol,
                                          SymbolTable, symbol_shorthand)


def test_symbol_pack_roundtrip():
    s = Symbol('x', 5)
    assert int(s) == (ord('x') << 56) | 5
    s2 = Symbol(int(s))
    assert s2.chr == 'x' and s2.index == 5 and s2 == s
    assert str(s) == "x5"


def test_shorthand():
    X = symbol_shorthand.X
    L = symbol_shorthand.L
    assert X(3) == Symbol('x', 3)
    assert L(0) == Symbol('l', 0)


def test_labeled_symbol():
    s = LabeledSymbol('x', 'A', 7)
    s2 = LabeledSymbol(int(s))
    assert (s2.chr, s2.label, s2.index) == ('x', 'A', 7)
    assert s2 == s


def test_edge_key():
    e = EdgeKey(3, 4)
    e2 = EdgeKey(int(e))
    assert (e2.i, e2.j) == (3, 4)
    assert str(e) == "{3, 4}"


def test_symbol_table_bridge():
    t = SymbolTable({'x': 'se2', 'l': 'point2'})
    assert t.resolve(Symbol('x', 10)) == ('se2', 0)
    assert t.resolve(Symbol('l', 3)) == ('point2', 0)
    assert t.resolve(Symbol('x', 2)) == ('se2', 1)
    assert t.resolve(Symbol('x', 10)) == ('se2', 0)  # stable
    assert t.counts() == {'se2': 2, 'point2': 1}
