"""The engine's one controlled error channel.

The reference's contract is that any input yields a result or a
controlled query error (fuzz_targets/collect.rs: "must not panic").
``CompileError`` is that channel here; every language-level failure —
analyzer rejections (surfaced via _analyzed_select), patch errors,
object-shape errors — must subclass it so callers (and the
differential harness) can catch ONE type. Defined in a leaf module
because both the compiler and the function libraries raise it
(functions/objects.py cannot import the compiler at module scope —
the compiler imports it)."""

from __future__ import annotations


class CompileError(ValueError):
    pass
