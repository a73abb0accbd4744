"""A minimal JavaScript interpreter for executing viewer/viewer.js in CI.

VERDICT r4 weak item 5: the viewer had never executed (no JS runtime in
the sandbox, none installable).  This module is a tokenizer + recursive-
descent parser + tree-walking evaluator for the ES2017 subset viewer.js
uses: functions/closures/arrows, classes + `new` + `this`, const/let with
array destructuring and multiple declarators, for(;;) / for-of / while /
if / ternary / throw, template literals, object/array literals with
shorthand, member/index chains, compound assignment, ++/--, &&/|| value
semantics, `typeof` on undeclared names, and host objects (Math, Number,
Float32Array/Uint32Array/Uint8Array, Error, array/string methods).

It is NOT a general JS engine (no prototypes, regex, generators, getters,
ASI edge cases) — just enough to run the math/geometry/scene-graph half of
the viewer against recorded system JSON and assert real invariants.
"""

from __future__ import annotations

import math
import re


class JSUndefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = JSUndefined()


class JSThrow(Exception):
    def __init__(self, value):
        self.value = value
        super().__init__(str(value))


class JSArray(list):
    pass


class JSObject(dict):
    pass


class BreakEx(Exception):
    pass


class ContinueEx(Exception):
    pass


class ReturnEx(Exception):
    def __init__(self, value):
        self.value = value


# ------------------------------- lexer -------------------------------

_PUNCT = [
    "===", "!==", ">>>", "**=", "...", "=>", "==", "!=", "<<", ">>", "<=",
    ">=", "&&", "||", "++", "--", "+=", "-=", "*=", "/=", "%=", "**", "(",
    ")", "[", "]", "{", "}", ";", ",", ".", "?", ":", "=", "+", "-", "*",
    "/", "%", "<", ">", "!", "&", "|", "~", "^",
]
_KEYWORDS = {
    "function", "return", "const", "let", "var", "if", "else", "for", "of",
    "in", "while", "do", "break", "continue", "new", "class", "this",
    "true", "false", "null", "undefined", "typeof", "throw", "instanceof",
    "delete",
}
_ID_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_NUM_RE = re.compile(r"(?:0[xX][0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)")


def tokenize(src):
    toks = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "\\": "\\", c: c,
                                "'": "'", '"': '"', "`": "`"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            toks.append(("str", "".join(buf)))
            i = j + 1
            continue
        if c == "`":
            # template literal -> ("template", [parts]); parts are
            # ("str", s) or ("expr", token-list)
            j = i + 1
            parts = []
            buf = []
            while j < n and src[j] != "`":
                if src.startswith("${", j):
                    parts.append(("str", "".join(buf)))
                    buf = []
                    depth = 1
                    k = j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        k += 1
                    parts.append(("expr", tokenize(src[j + 2 : k - 1])))
                    j = k
                elif src[j] == "\\":
                    buf.append(src[j + 1])
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            parts.append(("str", "".join(buf)))
            toks.append(("template", parts))
            i = j + 1
            continue
        m = _NUM_RE.match(src, i)
        if m and (c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit())):
            t = m.group(0)
            toks.append(("num", float(int(t, 16)) if t[:2].lower() == "0x" else float(t)))
            i = m.end()
            continue
        m = _ID_RE.match(src, i)
        if m:
            w = m.group(0)
            toks.append(("kw" if w in _KEYWORDS else "id", w))
            i = m.end()
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p))
                i += len(p)
                break
        else:
            raise SyntaxError(f"unexpected char {c!r} at {i}")
    toks.append(("eof", None))
    return toks


# ------------------------------- parser ------------------------------


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, typ, val=None):
        t = self.peek()
        return t[0] == typ and (val is None or t[1] == val)

    def eat(self, typ, val=None):
        if not self.at(typ, val):
            raise SyntaxError(f"expected {typ} {val}, got {self.peek()} @tok{self.i}")
        return self.next()

    def opt(self, typ, val=None):
        if self.at(typ, val):
            self.next()
            return True
        return False

    # ---- statements ----
    def parse_program(self):
        body = []
        while not self.at("eof"):
            body.append(self.statement())
        return ("block", body)

    def statement(self):
        if self.at("punct", "{"):
            return self.block()
        if self.at("kw", "function"):
            self.next()
            name = self.eat("id")[1]
            fn = self.function_rest()
            return ("fundecl", name, fn)
        if self.at("kw", "class"):
            return self.class_decl()
        if self.at("kw", "const") or self.at("kw", "let") or self.at("kw", "var"):
            self.next()
            decls = [self.declarator()]
            while self.opt("punct", ","):
                decls.append(self.declarator())
            self.opt("punct", ";")
            return ("decl", decls)
        if self.at("kw", "return"):
            self.next()
            if self.at("punct", ";") or self.at("punct", "}"):
                self.opt("punct", ";")
                return ("return", None)
            e = self.expression()
            self.opt("punct", ";")
            return ("return", e)
        if self.at("kw", "throw"):
            self.next()
            e = self.expression()
            self.opt("punct", ";")
            return ("throw", e)
        if self.at("kw", "if"):
            self.next()
            self.eat("punct", "(")
            cond = self.expression()
            self.eat("punct", ")")
            then = self.statement()
            els = None
            if self.opt("kw", "else"):
                els = self.statement()
            return ("if", cond, then, els)
        if self.at("kw", "while"):
            self.next()
            self.eat("punct", "(")
            cond = self.expression()
            self.eat("punct", ")")
            return ("while", cond, self.statement())
        if self.at("kw", "for"):
            return self.for_stmt()
        if self.at("kw", "break"):
            self.next()
            self.opt("punct", ";")
            return ("break",)
        if self.at("kw", "continue"):
            self.next()
            self.opt("punct", ";")
            return ("continue",)
        if self.opt("punct", ";"):
            return ("empty",)
        e = self.expression()
        self.opt("punct", ";")
        return ("expr", e)

    def block(self):
        self.eat("punct", "{")
        body = []
        while not self.at("punct", "}"):
            body.append(self.statement())
        self.eat("punct", "}")
        return ("block", body)

    def declarator(self):
        if self.opt("punct", "["):
            names = []
            while not self.at("punct", "]"):
                names.append(self.eat("id")[1])
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "]")
            self.eat("punct", "=")
            return ("arr", names, self.assign_expr())
        name = self.eat("id")[1]
        init = None
        if self.opt("punct", "="):
            init = self.assign_expr()
        return ("one", name, init)

    def for_stmt(self):
        self.eat("kw", "for")
        self.eat("punct", "(")
        # for-of?
        save = self.i
        if self.at("kw", "const") or self.at("kw", "let") or self.at("kw", "var"):
            self.next()
            if self.at("id") and self.peek(1) == ("kw", "of"):
                name = self.next()[1]
                self.next()  # of
                it = self.expression()
                self.eat("punct", ")")
                return ("forof", name, it, self.statement())
            self.i = save
        init = None
        if not self.at("punct", ";"):
            init = self.statement()  # consumes its own ';'
        else:
            self.next()
        cond = None if self.at("punct", ";") else self.expression()
        self.eat("punct", ";")
        step = None if self.at("punct", ")") else self.expression()
        self.eat("punct", ")")
        return ("for", init, cond, step, self.statement())

    def class_decl(self):
        self.eat("kw", "class")
        name = self.eat("id")[1]
        self.eat("punct", "{")
        methods = {}
        while not self.at("punct", "}"):
            if self.opt("punct", ";"):
                continue
            mname = self.next()[1]
            methods[mname] = self.function_rest()
        self.eat("punct", "}")
        return ("classdecl", name, methods)

    def function_rest(self):
        self.eat("punct", "(")
        params = []
        while not self.at("punct", ")"):
            params.append(self.eat("id")[1])
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        body = self.block()
        return ("function", params, body)

    # ---- expressions (precedence climbing) ----
    def expression(self):
        e = self.assign_expr()
        while self.opt("punct", ","):
            e2 = self.assign_expr()
            e = ("comma", e, e2)
        return e

    def assign_expr(self):
        # arrow functions
        save = self.i
        arrow = self.try_arrow()
        if arrow is not None:
            return arrow
        self.i = save
        left = self.ternary()
        t = self.peek()
        if t[0] == "punct" and t[1] in ("=", "+=", "-=", "*=", "/=", "%="):
            self.next()
            right = self.assign_expr()
            return ("assign", t[1], left, right)
        return left

    def try_arrow(self):
        params = None
        if self.at("id") and self.peek(1) == ("punct", "=>"):
            params = [self.next()[1]]
            self.next()
        elif self.at("punct", "("):
            j = self.i + 1
            ps = []
            ok = True
            while self.toks[j][0] != "eof" and self.toks[j] != ("punct", ")"):
                if self.toks[j][0] != "id":
                    ok = False
                    break
                ps.append(self.toks[j][1])
                j += 1
                if self.toks[j] == ("punct", ","):
                    j += 1
            if ok and self.toks[j] == ("punct", ")") and self.toks[j + 1] == ("punct", "=>"):
                params = ps
                self.i = j + 2
        if params is None:
            return None
        if self.at("punct", "{"):
            body = self.block()
            return ("arrow", params, body)
        return ("arrow", params, ("return", self.assign_expr()))

    def ternary(self):
        c = self.binary(0)
        if self.opt("punct", "?"):
            a = self.assign_expr()
            self.eat("punct", ":")
            b = self.assign_expr()
            return ("ternary", c, a, b)
        return c

    _BINOPS = [
        ["||"], ["&&"], ["|"], ["^"], ["&"], ["===", "!==", "==", "!="],
        ["<", "<=", ">", ">=", "instanceof"], ["<<", ">>", ">>>"],
        ["+", "-"], ["*", "/", "%"],
        ["**"],
    ]

    def binary(self, lvl):
        if lvl >= len(self._BINOPS):
            return self.unary()
        e = self.binary(lvl + 1)
        while True:
            t = self.peek()
            val = t[1]
            if (t[0] == "punct" and val in self._BINOPS[lvl]) or (
                t[0] == "kw" and val in self._BINOPS[lvl]
            ):
                self.next()
                # JS '**' is right-associative: recurse at the SAME level
                r = self.binary(lvl if val == "**" else lvl + 1)
                e = ("binop", val, e, r)
                if val == "**":
                    return e
            else:
                return e

    def unary(self):
        t = self.peek()
        if t[0] == "punct" and t[1] in ("!", "-", "+", "~"):
            self.next()
            return ("unop", t[1], self.unary())
        if t == ("kw", "typeof"):
            self.next()
            return ("typeof", self.unary())
        if t == ("kw", "new"):
            self.next()
            callee = self.postfix(newmode=True)
            return callee
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.next()
            return ("preinc", t[1], self.unary())
        return self.postfix()

    def postfix(self, newmode=False):
        e = self.primary()
        made_new = False
        while True:
            if self.opt("punct", "."):
                name = self.next()[1]
                e = ("member", e, name)
            elif self.opt("punct", "["):
                idx = self.expression()
                self.eat("punct", "]")
                e = ("index", e, idx)
            elif self.at("punct", "("):
                args = self.arguments()
                if newmode and not made_new:
                    e = ("new", e, args)
                    made_new = True
                else:
                    e = ("call", e, args)
            elif self.at("punct", "++") or self.at("punct", "--"):
                op = self.next()[1]
                e = ("postinc", op, e)
            else:
                break
        if newmode and not made_new:
            e = ("new", e, [])
        return e

    def arguments(self):
        self.eat("punct", "(")
        args = []
        while not self.at("punct", ")"):
            args.append(self.assign_expr())
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        return args

    def primary(self):
        t = self.next()
        if t[0] == "num":
            return ("num", t[1])
        if t[0] == "str":
            return ("str", t[1])
        if t[0] == "template":
            parts = []
            for kind, v in t[1]:
                if kind == "str":
                    parts.append(("str", v))
                else:
                    parts.append(("expr", Parser(v + [("eof", None)]).expression()))
            return ("template", parts)
        if t == ("kw", "true"):
            return ("bool", True)
        if t == ("kw", "false"):
            return ("bool", False)
        if t == ("kw", "null"):
            return ("null",)
        if t == ("kw", "undefined"):
            return ("undef",)
        if t == ("kw", "this"):
            return ("this",)
        if t == ("kw", "function"):
            if self.at("id"):
                self.next()
            return self.function_rest()
        if t[0] == "id":
            return ("var", t[1])
        if t == ("punct", "("):
            e = self.expression()
            self.eat("punct", ")")
            return e
        if t == ("punct", "["):
            items = []
            while not self.at("punct", "]"):
                items.append(self.assign_expr())
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "]")
            return ("array", items)
        if t == ("punct", "{"):
            props = []
            while not self.at("punct", "}"):
                k = self.next()
                if k[0] in ("id", "str", "kw"):
                    key = k[1]
                elif k[0] == "num":
                    key = str(k[1])
                else:
                    raise SyntaxError(f"bad object key {k}")
                if self.opt("punct", ":"):
                    props.append((key, self.assign_expr()))
                else:
                    props.append((key, ("var", key)))  # shorthand
                if not self.opt("punct", ","):
                    break
            self.eat("punct", "}")
            return ("object", props)
        raise SyntaxError(f"unexpected token {t} @tok{self.i}")


# ------------------------------ runtime ------------------------------


class Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def get(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s.vars[name]
            s = s.parent
        raise JSThrow(f"ReferenceError: {name} is not defined")

    def has(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return True
            s = s.parent
        return False

    def set(self, name, value):
        s = self
        while s is not None:
            if name in s.vars:
                s.vars[name] = value
                return
            s = s.parent
        # implicit global
        self.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value


class JSFunction:
    def __init__(self, params, body, scope, interp, this=None):
        self.params = params
        self.body = body
        self.scope = scope
        self.interp = interp
        self.this = this

    def call(self, args, this=None):
        sc = Scope(self.scope)
        for i, p in enumerate(self.params):
            sc.declare(p, args[i] if i < len(args) else UNDEF)
        sc.declare("arguments", JSArray(args))
        use_this = self.this if self.this is not None else this
        try:
            self.interp.exec_stmt(self.body, sc, use_this)
        except ReturnEx as r:
            return r.value
        return UNDEF


class JSClass:
    def __init__(self, name, methods, scope, interp):
        self.name = name
        self.methods = methods
        self.scope = scope
        self.interp = interp

    def construct(self, args):
        obj = JSObject()
        obj["__class__"] = self
        ctor = self.methods.get("constructor")
        if ctor:
            JSFunction(ctor[1], ctor[2], self.scope, self.interp).call(args, this=obj)
        return obj


def _typed_array(args):
    if not args:
        return JSArray()
    a = args[0]
    if isinstance(a, (int, float)):
        return JSArray([0.0] * int(a))
    return JSArray(list(a))


def _js_num(x):
    if isinstance(x, bool):
        return 1.0 if x else 0.0
    if isinstance(x, (int, float)):
        return float(x)
    if isinstance(x, str):
        try:
            return float(x) if x.strip() else 0.0
        except ValueError:
            return float("nan")
    if x is None or x is UNDEF:
        return 0.0 if x is None else float("nan")
    return float("nan")


def _wrap_int32(x):
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _to_int32(v):
    n = _js_num(v)
    if n != n or n in (float("inf"), float("-inf")):
        return 0
    return _wrap_int32(int(n))


def truthy(v):
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, (int, float)):
        return v != 0 and v == v
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_str(v):
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, JSArray):
        return ",".join(js_str(x) for x in v)
    return str(v)


class Interp:
    def __init__(self, host_globals=None):
        self.global_scope = Scope()
        g = self.global_scope
        g.declare("Math", self._make_math())
        g.declare("Number", lambda args, this=None: _js_num(args[0]) if args else 0.0)
        g.declare("Float32Array", ("hostclass", _typed_array))
        g.declare("Float64Array", ("hostclass", _typed_array))
        g.declare("Uint32Array", ("hostclass", _typed_array))
        g.declare("Uint16Array", ("hostclass", _typed_array))
        g.declare("Uint8Array", ("hostclass", _typed_array))
        g.declare("Int32Array", ("hostclass", _typed_array))
        g.declare("Error", ("hostclass", lambda args: JSObject(
            message=args[0] if args else "", __error__=True)))
        g.declare("NaN", float("nan"))
        g.declare("Infinity", float("inf"))
        g.declare("console", JSObject(log=lambda args, this=None: None))
        g.declare("JSON", JSObject(
            stringify=lambda args, this=None: js_str(args[0]) if args else "undefined"))
        if host_globals:
            for k, v in host_globals.items():
                g.declare(k, v)

    def _make_math(self):
        m = JSObject()
        m["PI"] = math.pi
        for name, fn in [
            ("cos", math.cos), ("sin", math.sin), ("tan", math.tan),
            ("sqrt", math.sqrt), ("abs", abs), ("floor", math.floor),
            ("exp", math.exp), ("atan2", math.atan2), ("acos", math.acos),
            ("log", math.log), ("sign", lambda x: (x > 0) - (x < 0)),
        ]:
            m[name] = (lambda f: lambda args, this=None: float(f(*args)))(fn)
        m["ceil"] = lambda args, this=None: float(math.ceil(args[0]))
        m["round"] = lambda args, this=None: float(math.floor(args[0] + 0.5))
        m["min"] = lambda args, this=None: min(args)
        m["max"] = lambda args, this=None: max(args)
        m["hypot"] = lambda args, this=None: math.hypot(*args)
        m["pow"] = lambda args, this=None: float(args[0]) ** float(args[1])
        m["random"] = lambda args, this=None: 0.5
        return m

    # ---------- public API ----------
    def run(self, source):
        ast = Parser(tokenize(source)).parse_program()
        self.exec_stmt(ast, self.global_scope, UNDEF, toplevel=True)
        return self

    def call(self, name, *py_args):
        fn = self.global_scope.get(name)
        args = [to_js(a) for a in py_args]
        if isinstance(fn, JSFunction):
            return to_py(fn.call(args))
        if callable(fn):
            return to_py(fn(args))
        raise TypeError(f"{name} is not callable")

    # ---------- statements ----------
    def exec_stmt(self, node, scope, this, toplevel=False):
        op = node[0]
        if op == "block":
            sc = scope if toplevel else Scope(scope)
            # hoist function declarations
            for st in node[1]:
                if st[0] == "fundecl":
                    sc.declare(st[1], JSFunction(st[2][1], st[2][2], sc, self))
                elif st[0] == "classdecl":
                    sc.declare(st[1], JSClass(st[1], st[2], sc, self))
            for st in node[1]:
                self.exec_stmt(st, sc, this)
        elif op in ("fundecl", "classdecl", "empty"):
            pass  # hoisted
        elif op == "decl":
            for d in node[1]:
                if d[0] == "one":
                    scope.declare(d[1], self.eval(d[2], scope, this) if d[2] else UNDEF)
                else:
                    val = self.eval(d[2], scope, this)
                    for i, nm in enumerate(d[1]):
                        scope.declare(nm, val[i] if i < len(val) else UNDEF)
        elif op == "expr":
            self.eval(node[1], scope, this)
        elif op == "return":
            raise ReturnEx(self.eval(node[1], scope, this) if node[1] else UNDEF)
        elif op == "throw":
            raise JSThrow(self.eval(node[1], scope, this))
        elif op == "if":
            if truthy(self.eval(node[1], scope, this)):
                self.exec_stmt(node[2], scope, this)
            elif node[3]:
                self.exec_stmt(node[3], scope, this)
        elif op == "while":
            while truthy(self.eval(node[1], scope, this)):
                try:
                    self.exec_stmt(node[2], scope, this)
                except BreakEx:
                    break
                except ContinueEx:
                    continue
        elif op == "for":
            sc = Scope(scope)
            if node[1]:
                self.exec_stmt(node[1], sc, this)
            while node[2] is None or truthy(self.eval(node[2], sc, this)):
                try:
                    self.exec_stmt(node[4], sc, this)
                except BreakEx:
                    break
                except ContinueEx:
                    pass
                if node[3]:
                    self.eval(node[3], sc, this)
        elif op == "forof":
            it = self.eval(node[2], scope, this)
            for v in list(it):
                sc = Scope(scope)
                sc.declare(node[1], v)
                try:
                    self.exec_stmt(node[3], sc, this)
                except BreakEx:
                    break
                except ContinueEx:
                    continue
        elif op == "break":
            raise BreakEx()
        elif op == "continue":
            raise ContinueEx()
        else:
            raise SyntaxError(f"unknown stmt {op}")

    # ---------- expressions ----------
    def eval(self, node, scope, this):
        op = node[0]
        if op == "num":
            return node[1]
        if op == "str":
            return node[1]
        if op == "bool":
            return node[1]
        if op == "null":
            return None
        if op == "undef":
            return UNDEF
        if op == "this":
            return this
        if op == "var":
            return scope.get(node[1])
        if op == "template":
            out = []
            for kind, v in node[1]:
                out.append(v if kind == "str" else js_str(self.eval(v, scope, this)))
            return "".join(out)
        if op == "array":
            return JSArray(self.eval(e, scope, this) for e in node[1])
        if op == "object":
            o = JSObject()
            for k, v in node[1]:
                o[k] = self.eval(v, scope, this)
            return o
        if op == "function":
            return JSFunction(node[1], node[2], scope, self)
        if op == "arrow":
            # arrows capture `this` lexically
            return JSFunction(node[1], node[2], scope, self, this=this)
        if op == "member":
            obj = self.eval(node[1], scope, this)
            return self.get_member(obj, node[2])
        if op == "index":
            obj = self.eval(node[1], scope, this)
            idx = self.eval(node[2], scope, this)
            return self.get_index(obj, idx)
        if op == "call":
            return self.eval_call(node, scope, this)
        if op == "new":
            cls = self.eval(node[1], scope, this)
            args = [self.eval(a, scope, this) for a in node[2]]
            if isinstance(cls, tuple) and cls[0] == "hostclass":
                return cls[1](args)
            if isinstance(cls, JSClass):
                return cls.construct(args)
            raise JSThrow(f"not a constructor: {cls}")
        if op == "typeof":
            try:
                v = (
                    scope.get(node[1][1])
                    if node[1][0] == "var"
                    else self.eval(node[1], scope, this)
                )
            except JSThrow:
                return "undefined"
            if v is UNDEF:
                return "undefined"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, (JSFunction, JSClass)) or callable(v):
                return "function"
            return "object"
        if op == "unop":
            v = self.eval(node[2], scope, this)
            if node[1] == "!":
                return not truthy(v)
            if node[1] == "-":
                return -_js_num(v)
            if node[1] == "+":
                return _js_num(v)
            if node[1] == "~":
                return float(~int(_js_num(v)))
        if op == "binop":
            o = node[1]
            if o == "&&":
                left = self.eval(node[2], scope, this)
                return self.eval(node[3], scope, this) if truthy(left) else left
            if o == "||":
                left = self.eval(node[2], scope, this)
                return left if truthy(left) else self.eval(node[3], scope, this)
            a = self.eval(node[2], scope, this)
            b = self.eval(node[3], scope, this)
            if o == "+":
                if isinstance(a, str) or isinstance(b, str):
                    return js_str(a) + js_str(b)
                return _js_num(a) + _js_num(b)
            if o == "-":
                return _js_num(a) - _js_num(b)
            if o == "*":
                return _js_num(a) * _js_num(b)
            if o == "/":
                bb = _js_num(b)
                aa = _js_num(a)
                if bb == 0:
                    return float("nan") if aa == 0 else math.copysign(float("inf"), aa) * math.copysign(1, bb)
                return aa / bb
            if o == "%":
                return math.fmod(_js_num(a), _js_num(b))
            if o == "**":
                return _js_num(a) ** _js_num(b)
            if o in ("===", "=="):
                return self.js_eq(a, b)
            if o in ("!==", "!="):
                return not self.js_eq(a, b)
            if o == "<":
                return self.cmp(a, b) < 0
            if o == "<=":
                return self.cmp(a, b) <= 0
            if o == ">":
                return self.cmp(a, b) > 0
            if o == ">=":
                return self.cmp(a, b) >= 0
            if o in ("<<", ">>", ">>>", "|", "&", "^"):
                # JS semantics: operands coerce through ToInt32/ToUint32
                ai = _to_int32(a)
                sh = int(_js_num(b)) & 31
                if o == "<<":
                    return float(_wrap_int32(ai << sh))
                if o == ">>":
                    return float(ai >> sh)
                if o == ">>>":
                    return float((ai & 0xFFFFFFFF) >> sh)
                bi = _to_int32(b)
                if o == "|":
                    return float(_wrap_int32(ai | bi))
                if o == "&":
                    return float(_wrap_int32(ai & bi))
                return float(_wrap_int32(ai ^ bi))
            if o == "instanceof":
                return isinstance(a, JSObject) and a.get("__class__") is b
        if op == "ternary":
            return (
                self.eval(node[2], scope, this)
                if truthy(self.eval(node[1], scope, this))
                else self.eval(node[3], scope, this)
            )
        if op == "assign":
            return self.eval_assign(node, scope, this)
        if op in ("preinc", "postinc"):
            target = node[2]
            old = _js_num(self.eval(target, scope, this))
            new = old + (1 if node[1] == "++" else -1)
            self.store(target, new, scope, this)
            return new if op == "preinc" else old
        if op == "comma":
            self.eval(node[1], scope, this)
            return self.eval(node[2], scope, this)
        raise SyntaxError(f"unknown expr {op}")

    def js_eq(self, a, b):
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return float(a) == float(b)
        if (a is None or a is UNDEF) and (b is None or b is UNDEF):
            return True
        return a is b or a == b if type(a) == type(b) else False

    def cmp(self, a, b):
        if isinstance(a, str) and isinstance(b, str):
            return (a > b) - (a < b)
        x, y = _js_num(a), _js_num(b)
        return (x > y) - (x < y)

    def eval_assign(self, node, scope, this):
        _, op, target, rhs = node
        val = self.eval(rhs, scope, this)
        if op != "=":
            cur = self.eval(target, scope, this)
            o = op[0]
            if o == "+":
                if isinstance(cur, str) or isinstance(val, str):
                    val = js_str(cur) + js_str(val)
                else:
                    val = _js_num(cur) + _js_num(val)
            elif o == "-":
                val = _js_num(cur) - _js_num(val)
            elif o == "*":
                val = _js_num(cur) * _js_num(val)
            elif o == "/":
                val = _js_num(cur) / _js_num(val)
            elif o == "%":
                val = math.fmod(_js_num(cur), _js_num(val))
        self.store(target, val, scope, this)
        return val

    def store(self, target, val, scope, this):
        if target[0] == "var":
            scope.set(target[1], val)
        elif target[0] == "member":
            obj = self.eval(target[1], scope, this)
            if isinstance(obj, JSObject):
                obj[target[2]] = val
            else:
                setattr(obj, target[2], val)
        elif target[0] == "index":
            obj = self.eval(target[1], scope, this)
            idx = self.eval(target[2], scope, this)
            if isinstance(obj, JSArray):
                i = int(idx)
                while len(obj) <= i:
                    obj.append(UNDEF)
                obj[i] = val
            elif isinstance(obj, JSObject):
                obj[js_str(idx) if not isinstance(idx, str) else idx] = val
        else:
            raise SyntaxError(f"bad assignment target {target[0]}")

    def eval_call(self, node, scope, this):
        _, callee, argnodes = node
        args = [self.eval(a, scope, this) for a in argnodes]
        if callee[0] == "member":
            obj = self.eval(callee[1], scope, this)
            fn = self.get_member(obj, callee[2])
            return self.invoke(fn, args, obj)
        if callee[0] == "index":
            obj = self.eval(callee[1], scope, this)
            fn = self.get_index(obj, self.eval(callee[2], scope, this))
            return self.invoke(fn, args, obj)
        fn = self.eval(callee, scope, this)
        return self.invoke(fn, args, UNDEF)

    def invoke(self, fn, args, this):
        if isinstance(fn, JSFunction):
            return fn.call(args, this=this)
        if isinstance(fn, tuple) and fn[0] == "bound":
            return fn[1](args, fn[2])
        if callable(fn):
            try:
                return fn(args, this)
            except TypeError:
                return fn(args)
        raise JSThrow(f"TypeError: not a function: {fn!r}")

    # ---------- member access ----------
    def get_member(self, obj, name):
        if isinstance(obj, JSObject):
            if name in obj:
                return obj[name]
            cls = obj.get("__class__")
            if isinstance(cls, JSClass) and name in cls.methods:
                m = cls.methods[name]
                return JSFunction(m[1], m[2], cls.scope, self, this=obj)
            return UNDEF
        if isinstance(obj, JSArray):
            return self.array_member(obj, name)
        if isinstance(obj, str):
            return self.string_member(obj, name)
        if isinstance(obj, JSClass):
            return UNDEF
        if obj is UNDEF or obj is None:
            raise JSThrow(f"TypeError: cannot read '{name}' of {js_str(obj)}")
        return UNDEF

    def get_index(self, obj, idx):
        if isinstance(obj, (JSArray, str)):
            if isinstance(idx, (int, float)):
                i = int(idx)
                if 0 <= i < len(obj):
                    return obj[i]
                return UNDEF
            return self.get_member(obj, js_str(idx))
        if isinstance(obj, JSObject):
            key = idx if isinstance(idx, str) else js_str(idx)
            return obj.get(key, UNDEF)
        raise JSThrow(f"TypeError: cannot index {js_str(obj)}")

    def array_member(self, arr, name):
        if name == "length":
            return float(len(arr))
        interp = self

        def method(fn):
            return ("bound", fn, arr)

        if name == "push":
            return method(lambda args, a: (a.extend(args), float(len(a)))[1])
        if name == "pop":
            return method(lambda args, a: a.pop() if a else UNDEF)
        if name == "forEach":
            def _foreach(args, a):
                f = args[0]
                for i, v in enumerate(list(a)):
                    interp.invoke(f, [v, float(i), a], UNDEF)
                return UNDEF
            return method(_foreach)
        if name == "map":
            def _map(args, a):
                f = args[0]
                return JSArray(
                    interp.invoke(f, [v, float(i), a], UNDEF)
                    for i, v in enumerate(list(a))
                )
            return method(_map)
        if name == "filter":
            def _filter(args, a):
                f = args[0]
                return JSArray(
                    v for i, v in enumerate(list(a))
                    if truthy(interp.invoke(f, [v, float(i), a], UNDEF))
                )
            return method(_filter)
        if name == "join":
            return method(lambda args, a: (args[0] if args else ",").join(js_str(v) for v in a))
        if name == "slice":
            def _slice(args, a):
                start = int(args[0]) if args else 0
                end = int(args[1]) if len(args) > 1 else len(a)
                return JSArray(list(a)[start:end])
            return method(_slice)
        if name == "concat":
            def _concat(args, a):
                out = JSArray(a)
                for x in args:
                    if isinstance(x, JSArray):
                        out.extend(x)
                    else:
                        out.append(x)
                return out
            return method(_concat)
        if name == "indexOf":
            def _indexof(args, a):
                try:
                    return float(a.index(args[0]))
                except ValueError:
                    return -1.0
            return method(_indexof)
        if name == "includes":
            return method(lambda args, a: args[0] in a)
        if name == "fill":
            def _fill(args, a):
                for i in range(len(a)):
                    a[i] = args[0]
                return a
            return method(_fill)
        if name == "flat":
            def _flat(args, a):
                out = JSArray()
                for x in a:
                    if isinstance(x, JSArray):
                        out.extend(x)
                    else:
                        out.append(x)
                return out
            return method(_flat)
        if name == "set":  # typed-array set
            def _set(args, a):
                src = args[0]
                off = int(args[1]) if len(args) > 1 else 0
                for i, v in enumerate(src):
                    a[off + i] = v
                return UNDEF
            return method(_set)
        if name == "reduce":
            def _reduce(args, a):
                f = args[0]
                acc = args[1] if len(args) > 1 else a[0]
                start = 0 if len(args) > 1 else 1
                for i in range(start, len(a)):
                    acc = interp.invoke(f, [acc, a[i], float(i), a], UNDEF)
                return acc
            return method(_reduce)
        return UNDEF

    def string_member(self, s, name):
        if name == "length":
            return float(len(s))
        def method(fn):
            return ("bound", fn, s)
        if name == "split":
            return method(lambda args, st: JSArray(st.split(args[0])))
        if name == "toUpperCase":
            return method(lambda args, st: st.upper())
        if name == "toLowerCase":
            return method(lambda args, st: st.lower())
        if name == "charAt":
            return method(lambda args, st: st[int(args[0])] if 0 <= int(args[0]) < len(st) else "")
        if name == "slice":
            return method(lambda args, st: st[int(args[0]):(int(args[1]) if len(args) > 1 else None)])
        if name == "indexOf":
            return method(lambda args, st: float(st.find(args[0])))
        return UNDEF


# ----------------------- python <-> js bridging -----------------------


def to_js(v):
    if isinstance(v, dict):
        return JSObject({k: to_js(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return JSArray(to_js(x) for x in v)
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def to_py(v):
    if isinstance(v, JSObject):
        return {k: to_py(x) for k, x in v.items() if k != "__class__"}
    if isinstance(v, JSArray):
        return [to_py(x) for x in v]
    if v is UNDEF:
        return None
    return v
