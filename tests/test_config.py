"""Precision config semantics: process-wide set_precision (serving handler
threads must see it) + context-local precision_scope (concurrent scopes can't
race each other)."""

import threading

from videotofaces_tpu import config


def test_set_precision_visible_in_worker_threads():
    config.set_precision("highest")
    try:
        config.set_precision("default")
        seen = []
        # fresh threads have empty contexts — a plain ContextVar default
        # would silently revert to 'highest' here (the serve.py handler case)
        t = threading.Thread(target=lambda: seen.append(config.get_precision_name()))
        t.start()
        t.join()
        assert seen == ["default"]
    finally:
        config.set_precision("highest")


def test_precision_scope_is_context_local():
    config.set_precision("highest")
    with config.precision_scope("default"):
        assert config.get_precision_name() == "default"
        # a scope must NOT leak into other threads
        seen = []
        t = threading.Thread(target=lambda: seen.append(config.get_precision_name()))
        t.start()
        t.join()
        assert seen == ["highest"]
    assert config.get_precision_name() == "highest"
