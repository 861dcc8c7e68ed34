"""Serve the LIVE dashboard: synthesize masters, run the real ETL,
register the warehouse, and answer every panel request by re-running
the view's SQL — the reference's Streamlit interaction loop
(`dashboard.py:46-47`) on stdlib http.server, any year value welcome.

Usage: python tools/serve_dashboard.py [sf_dir] [port]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.plans import (  # noqa: E402
    dashboard_server,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.session import (  # noqa: E402
    get_spark,
)
from tools.render_dashboard import prepare_warehouse  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8765
    spark = get_spark("serve-dashboard")
    spark.sparkContext.setLogLevel("ERROR")
    years = prepare_warehouse(spark, sf_dir)
    srv = dashboard_server.make_dashboard_server(spark, years, port=port)
    host, bound = srv.server_address[:2]
    print(f"serving live dashboard on http://{host}:{bound}/ "
          f"(years {years[0]}–{years[-1]}; ad-hoc years welcome)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
