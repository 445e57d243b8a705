"""Load the reference's IPLoM module standalone for parity testing.

Same approach as reference_drain: exec only
/root/reference/logai/algorithms/parsing_algo/iplom.py with its package
import surface stubbed. Used strictly as a test oracle — none of its code is
shipped in logai_spark.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_IPLOM = "/root/reference/logai/algorithms/parsing_algo/iplom.py"


def load_reference_iplom():
    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    class ParsingAlgo:
        pass

    class Config:
        @classmethod
        def from_dict(cls, d):
            return cls(**d)

    class _Factory:
        def register(self, *a, **k):
            def deco(c):
                return c

            return deco

    stub("logai")
    stub("logai.algorithms")
    stub("logai.algorithms.algo_interfaces", ParsingAlgo=ParsingAlgo)
    stub("logai.config_interfaces", Config=Config)
    stub("logai.algorithms.factory", factory=_Factory())

    spec = importlib.util.spec_from_file_location("refiplom", REF_IPLOM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
