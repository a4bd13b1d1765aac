"""No-op tenacity stand-in: parity tests call parse_content only (pure
function of HTML) — retry behavior is covered by the loopback fetch
contract test, not here."""

from __future__ import annotations


def stop_after_attempt(n):  # noqa: ANN001
    return n


def wait_fixed(seconds):  # noqa: ANN001
    return seconds


class Retrying:
    def __init__(self, stop=None, wait=None, reraise=True, **kw):  # noqa: ANN001
        self.stop = stop

    def __call__(self, fn, *args, **kwargs):  # noqa: ANN001
        return fn(*args, **kwargs)


def retry(*dargs, **dkwargs):  # noqa: ANN002, ANN003
    if len(dargs) == 1 and callable(dargs[0]) and not dkwargs:
        return dargs[0]

    def deco(fn):  # noqa: ANN001
        return fn

    return deco
