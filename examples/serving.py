"""Serving example: expose the engine over BOTH wire protocols the
reference's clients speak — Arrow Flight (gRPC) and the scheduler REST
surface — and query them from real clients in-process.

Run: python examples/serving.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from datafusion_ballista_dhruvil_spark.flight import start_flight_endpoint
    from datafusion_ballista_dhruvil_spark.rest import RestServer
    from datafusion_ballista_dhruvil_spark.session import (
        create_session,
        register_tables,
    )

    spark = create_session(app_name="serving-example", shuffle_partitions=8)
    register_tables(spark, sf_dir)
    sql = (
        "SELECT n_name, count(*) AS n_suppliers FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY n_suppliers DESC, n_name LIMIT 5"
    )

    # --- native Arrow Flight (gRPC): plan via GetFlightInfo, stream DoGet
    import pyarrow.flight as fl

    server = start_flight_endpoint(spark)
    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    info = client.get_flight_info(fl.FlightDescriptor.for_command(sql))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    print("flight schema:", [f.name for f in info.schema])
    print(table.to_pandas().to_string(index=False))
    client.close()
    server.shutdown()

    # --- scheduler REST surface: state + SQL over HTTP
    rest = RestServer(spark).start()
    base = f"http://127.0.0.1:{rest.port}"
    with urllib.request.urlopen(f"{base}/api/state") as r:
        print("rest state:", json.loads(r.read())["status"])
    req = urllib.request.Request(
        f"{base}/api/sql",
        data=json.dumps({"sql": sql}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        payload = json.loads(r.read())
    print("rest rows:", payload["rows"])
    rest.stop()
    spark.stop()


if __name__ == "__main__":
    main()
