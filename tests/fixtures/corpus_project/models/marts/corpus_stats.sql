select source, lang,
       count(*) as n_docs,
       avg(n_words) as avg_words,
       sum(n_words) as total_words
from {{ ref('clean_docs') }}
group by source, lang
