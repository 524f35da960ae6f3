from ..registry import PIPELINES


@PIPELINES.register_module
class Empty:
    """No-op pipeline stage (used by configs when a stage is disabled)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, res, info):
        return res, info
