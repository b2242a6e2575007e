select doc_id, text, lang, source, n_chars
from {{ source('corpus', 'documents') }}
where text is not null and length(trim(text)) > 0
