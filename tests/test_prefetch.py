"""train/data.py::prefetch — background batch production semantics."""

import threading
import time

import pytest

from ics_tpu.train.data import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("decode blew up")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="decode blew up"):
        next(it)


def test_overlap_actually_happens():
    """Producer must run ahead while the consumer is busy."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    deadline = time.time() + 5
    # with the consumer idle, the producer should fill the queue (depth 2)
    # plus the one blocked put -> at least 3 produced beyond the consumed one
    while len(produced) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 3


def test_abandoned_iterator_stops_producer():
    n_before = threading.active_count()

    def endless():
        i = 0
        while True:
            yield i
            i += 1

    it = prefetch(endless(), depth=1)
    assert next(it) == 0
    it.close()  # generator finally -> stop event
    deadline = time.time() + 5
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "train-prefetch" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not [t for t in threading.enumerate()
                if t.name == "train-prefetch" and t.is_alive()]
    assert threading.active_count() <= n_before + 1
