"""Analysis chains: charfilters -> tokenizer -> token filters.

Mirrors Solr's TokenizerChain model (reference:
solr/core/src/java/org/apache/solr/analysis/TokenizerChain.java:36) and the
default configset chains ``text_general`` / ``text_en``
(solr/server/solr/configsets/_default/conf/managed-schema.xml:297-313,344-364).
"""

from solr_ray.analysis.chain import (  # noqa: F401
    Analyzer,
    ANALYZERS,
    get_analyzer,
    analyze_column,
    register_analyzer,
)
from solr_ray.analysis.porter import porter_stem  # noqa: F401
from solr_ray.analysis.stopwords import ENGLISH_STOP_WORDS  # noqa: F401
