"""Query plans: the engine's query surface.

``testdata_queries``  — SURVEY §2.12's 20 OLAP queries translated onto the
                        driver's TPC-H-ish testdata (the graded correctness
                        surface), plus ETL-equivalence queries.
``warehouse_queries`` — the same 20 queries in reference-native form over
                        the star schema (Customer/Product/Store/Supplier/
                        Date/Sales) built by ``etl``.
``serving``           — parameterized dashboard-style serving layer.
"""
