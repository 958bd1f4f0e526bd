import itertools
import time


class Counter:
    def __init__(self, start: int = 0) -> None:
        self._it = itertools.count(start)

    def __next__(self) -> int:
        return next(self._it)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def now() -> float:
    return time.monotonic()
