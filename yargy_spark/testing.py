"""Fault-injection helpers for tests.

These live in the package (not under ``tests/``) because broadcast
payloads unpickle by module reference on executors, and test modules
are not importable there.
"""


class FaultyParser:
    """Stand-in parser whose every entry point raises a non-budget
    kernel error — used to assert that the poison-turn guard reports
    kernel bugs distinctly from parse-budget trips."""

    def findall(self, text, tokens=None):
        raise RuntimeError('injected kernel fault')

    extract = match = findall

    def tokenize(self, text):
        return []
