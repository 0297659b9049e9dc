"""rika_ray — a Ray-Data-native document/content-extraction engine.

A brand-new engine with the query and data-processing capabilities of the
``keithrbennett/rika`` reference (a JRuby wrapper around Apache Tika), built
from scratch on ``ray.data.Dataset`` pipelines over zero-copy Arrow batches.

Reference surface recreated here (see SURVEY.md for the full inventory):

- MIME/content-type sniffing from magic bytes (reference: Tika
  ``DefaultDetector`` wired at ``lib/rika.rb:45``).
- Charset detection + text decode (reference: Tika-internal; observable in
  ``spec/rika/parser_spec.rb:225-227``).
- HTML main-content extraction (Boilerpipe-style density classifier; the
  north-rule upgrade of Tika's body-text extraction).
- PDF layout parsing into ordered text spans (reference: Tika PDFParser,
  goldens at ``spec/rika/parser_spec.rb:157-170``).
- Language detection from extracted content (reference:
  ``lib/rika.rb:58-61``).
- Metadata extraction/enrichment/key-sort, content truncation, typed
  error-as-data accumulation (reference: ``lib/rika/parser.rb:26-54``,
  ``lib/rika/cli/rika_command.rb:94-123,197-216``).

Plus the large-scale training-data operators a 100 TB corpus pipeline needs:
exact/MinHash-LSH/SimHash/embedding dedup, ANN similarity search, text
quality scoring, token counting, fingerprinting, and multimodal plumbing.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, CLI, test fixture).
"""

from rika_ray.schema import EXTRACTED_SCHEMA, WEB_PAGES_SCHEMA

__version__ = "0.1.0"

__all__ = ["WEB_PAGES_SCHEMA", "EXTRACTED_SCHEMA", "__version__"]
