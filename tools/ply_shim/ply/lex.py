"""Minimal, from-scratch implementation of the public ``ply.lex`` module API.

Purpose: the reference library (cmlburnett/pypdfproc) depends on PLY's
module-based lexer interface, and PLY is not installed in this sandbox.  To run
the reference IN-PROCESS as a differential-test oracle (freeze golden extracted
text for our fixture PDFs), we provide a small compatible implementation of the
subset of the documented PLY lex API the reference uses:

- ``lex()``       -- builds a Lexer from the *calling module's* globals
                     (``tokens``, ``t_<NAME>`` strings/functions, ``t_error``,
                     ``t_ignore``)
- ``Lexer.input/token/lexpos/lexdata/lineno``
- ``LexToken``    -- plain token record (type, value, lineno, lexpos)

Semantics replicated from PLY's documentation (public knowledge):
- function rules are tried first, in source-definition order
- string rules follow, sorted by decreasing regex length (stable)
- patterns are compiled with re.VERBOSE
- a function rule returning None discards the token and continues
- characters in ``t_ignore`` are skipped
- on no match, ``t_error`` is called with a token whose value is the
  remaining input; the rule may advance ``lexer.lexpos`` via ``skip()``

This file is test-harness tooling ONLY; the production engine
(``pypdfproc_spark``) does not import it.
"""

from __future__ import annotations

import re
import sys


class LexToken:
    type = None
    value = None
    lineno = 0
    lexpos = 0

    def __repr__(self):
        return "LexToken(%s,%r,%d,%d)" % (self.type, self.value, self.lineno, self.lexpos)


class Lexer:
    def __init__(self, rules, error_func, ignore):
        # rules: list of (name, compiled_regex, func_or_None)
        self._rules = rules
        self._error = error_func
        self._ignore = ignore or ""
        self.lexdata = None
        self.lexpos = 0
        self.lineno = 1
        # PLY-faithful master regex: one alternation of named groups, tried
        # left-to-right (same performance & semantics as PLY's lex.py)
        groups = []
        self._by_group = {}
        for k, (name, creg, func) in enumerate(rules):
            gname = "g%d" % k
            groups.append("(?P<%s>%s)" % (gname, creg.pattern))
            self._by_group[gname] = (name, func)
        self._master = re.compile("|".join(groups), re.VERBOSE)

    def input(self, data):
        self.lexdata = data
        self.lexpos = 0

    def skip(self, n):
        self.lexpos += n

    def clone(self):
        c = Lexer(self._rules, self._error, self._ignore)
        c.lexdata = self.lexdata
        c.lexpos = self.lexpos
        c.lineno = self.lineno
        return c

    def token(self):
        data = self.lexdata
        n = len(data)
        while self.lexpos < n:
            ch = data[self.lexpos]
            if ch in self._ignore:
                self.lexpos += 1
                continue
            m = self._master.match(data, self.lexpos)
            if m:
                name, func = self._by_group[m.lastgroup]
                tok = LexToken()
                tok.type = name
                tok.value = m.group()
                tok.lineno = self.lineno
                tok.lexpos = self.lexpos
                tok.lexer = self
                self.lexpos = m.end()
                if func is None:
                    return tok
                newtok = func(tok)
                if newtok is None:
                    continue  # discarded; scan on from updated lexpos
                return newtok
            else:
                # no rule matched -> error rule
                tok = LexToken()
                tok.type = "error"
                tok.value = data[self.lexpos:]
                tok.lineno = self.lineno
                tok.lexpos = self.lexpos
                tok.lexer = self
                if self._error is None:
                    raise SyntaxError(
                        "Illegal character %r at index %d" % (ch, self.lexpos)
                    )
                before = self.lexpos
                newtok = self._error(tok)
                if newtok is not None:
                    return newtok
                if self.lexpos == before:
                    raise SyntaxError(
                        "t_error did not skip past illegal character %r" % ch
                    )
        return None


def lex(module=None, **kwargs):
    """Build a Lexer from the calling module's t_ rules (PLY-compatible)."""
    if module is not None:
        g = module.__dict__
    else:
        g = sys._getframe(1).f_globals

    token_names = set(g.get("tokens") or ())
    func_rules = []
    str_rules = []
    for name, obj in g.items():
        if not name.startswith("t_"):
            continue
        tokname = name[2:]
        if tokname in ("error", "ignore"):
            continue
        if callable(obj):
            func_rules.append((tokname, obj))
        else:
            str_rules.append((tokname, obj))
    # PLY order: functions by definition order in source, then strings by
    # decreasing regex length (stable w.r.t. definition order).
    func_rules.sort(key=lambda kv: kv[1].__code__.co_firstlineno)
    str_rules.sort(key=lambda kv: len(kv[1]), reverse=True)

    rules = []
    for tokname, func in func_rules:
        pat = func.__doc__
        if not pat:
            raise SyntaxError("lex rule %s has no regex docstring" % tokname)
        rules.append((tokname, re.compile(pat, re.VERBOSE), func))
    for tokname, pat in str_rules:
        rules.append((tokname, re.compile(pat, re.VERBOSE), None))

    # NB: be permissive about rules for undeclared token names (some PLY
    # versions only warn; the reference relies on that for discarded tokens).
    _ = token_names

    return Lexer(rules, g.get("t_error"), g.get("t_ignore", ""))
