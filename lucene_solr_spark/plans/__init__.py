from .query import (  # noqa: F401
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    SynonymQuery,
    TermQuery,
)
from .parser import parse_query  # noqa: F401
