from . import analysis, bm25, codec, smallfloat  # noqa: F401
