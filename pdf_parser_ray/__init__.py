"""pdf_parser_ray — a Ray-Data-native main-content extraction engine.

Built from scratch with the query/data-processing capabilities of the
reference ``iWhyDuck/pdf-parser`` (see SURVEY.md), re-expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, with actor pools for stateful stages.

Layout:
    config.py     limits + regex field config (parity: reference config/config.py)
    schema.py     Arrow schemas (input_hint span struct, output table)
    functions/    pure, vectorizable kernels (validate, hash, regex, text stats,
                  minhash/simhash, embeddings)
    pdf/          from-scratch PDF text extraction kernel (no pdfplumber)
    html/         from-scratch HTML boilerplate-strip kernel
    sources/      io indirection + deterministic corpus synthesis
    stages/       Ray Data map_batches stages (stateless fns + actor-pool classes)
    state/        checkpoint manifest + resume
    pipelines/    end-to-end pipeline builders (extraction flagship, relational)

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"
