{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='doc_id') }}

select d.doc_id, d.text, d.lang, d.source, s.n_words, s.dup_line_frac
from {{ ref('stg_documents') }} d
join {{ ref('doc_signals') }} s on d.doc_id = s.doc_id
where s.n_words >= {{ var('min_words') }}
  and s.dup_line_frac <= {{ var('max_dup_line_frac') }}
{% if is_incremental() %}
  and d.doc_id > (select coalesce(max(doc_id), -1) from {{ this }})
{% endif %}
