from . import transcripts  # noqa: F401
