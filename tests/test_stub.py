"""Type-stub consistency: every public symbol must appear in
vali_tpu/__init__.pyi and every stub symbol must exist at runtime
(parity: reference ships a complete src/python_vali/__init__.pyi)."""

import ast
import os
import re

import vali_tpu as vali

STUB = os.path.join(os.path.dirname(os.path.abspath(vali.__file__)),
                    "__init__.pyi")


def stub_symbols():
    tree = ast.parse(open(STUB).read())
    classes, functions, aliases = set(), set(), set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            classes.add(node.name)
        elif isinstance(node, ast.FunctionDef):
            functions.add(node.name)
        elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name):
            aliases.add(node.target.id)
    return classes, functions, aliases


def test_stub_covers_public_api():
    classes, functions, aliases = stub_symbols()
    import types

    public = [n for n in dir(vali) if not n.startswith("_")
              and not isinstance(getattr(vali, n), types.ModuleType)]
    missing = []
    for name in public:
        obj = getattr(vali, name)
        if isinstance(obj, type):
            if name not in classes:
                missing.append(name)
        elif callable(obj):
            if name not in functions and name not in classes:
                missing.append(name)
        else:
            if name not in aliases and name not in classes:
                missing.append(name)
    assert not missing, f"stub missing public symbols: {missing}"


def test_stub_symbols_exist_at_runtime():
    classes, functions, aliases = stub_symbols()
    stale = [n for n in (classes | functions | aliases)
             if not hasattr(vali, n)]
    assert not stale, f"stub declares nonexistent symbols: {stale}"


def test_stub_enum_members_match():
    """Every enum member listed in the stub matches the runtime enum."""
    text = open(STUB).read()
    for enum_name in ("PixelFormat", "ColorSpace", "ColorRange",
                      "TaskExecInfo", "DecodeMode", "FfmpegLogLevel",
                      "NV_ENC_CAPS"):
        enum_cls = getattr(vali, enum_name)
        m = re.search(rf"class {enum_name}\(enum.IntEnum\):\n((?:    \w+: int\n)+)",
                      text)
        assert m, f"stub lacks members for {enum_name}"
        stub_members = set(re.findall(r"(\w+): int", m.group(1)))
        runtime = {e.name for e in enum_cls}
        assert stub_members == runtime, (
            enum_name, stub_members ^ runtime)
