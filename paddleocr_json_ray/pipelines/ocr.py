"""Placeholder: full pipeline builder arrives with the stages layer."""


def build_pipeline(config=None):
    raise NotImplementedError("pipeline builder not yet wired")
