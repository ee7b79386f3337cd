"""ruamel.yaml shim — import-only (see package docstring)."""


class YAML:
    def __init__(self, *a, **k):
        pass

    def load(self, stream):
        raise NotImplementedError(
            "ruamel shim: WandBLogger yaml loading is not supported in "
            "the north-star run")
