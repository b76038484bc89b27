#!/usr/bin/env python3
"""Wire-parity proof: the reference's own Python client library, imported
unmodified from the read-only reference checkout, speaking to GraftServer.

Replays the flow of reactive_db_python_client/examples/sample.py (insert
into grades + users, FindOne on the union table, listen for an Insert
event), asserting on every response. Passing means a user of the reference
can point their existing client at this engine's ServeMain and keep their
code.

Usage:  python3 scripts/python_client_parity.py
Exits 0 on success; prints FAIL and exits 1 otherwise.
"""
import glob
import os
import socket
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CLIENT = "/root/reference/reactive_db_python_client"
PORT = 18108

sys.path.insert(0, REF_CLIENT)
from reactive_db_client import ClientSync, create_insert_request, create_search_query  # noqa: E402

# Java 17 module flags Spark needs (the same set spark-submit passes).
JAVA_OPTS = [
    "-Xmx4g",
    "-Dio.netty.tryReflectionSetAccessible=true",
] + [
    f"--add-opens=java.base/{pkg}=ALL-UNNAMED"
    for pkg in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
        "sun.nio.cs", "sun.security.action", "sun.util.calendar",
    ]
]


def spawn_server():
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    if not glob.glob(os.path.join(classes, "graft", "net", "ServeMain*.class")):
        sys.exit("compile first: sbt compile (no classes at %s)" % classes)
    cp = classes + ":" + "/opt/spark/jars/*"
    cmd = ["java"] + JAVA_OPTS + ["-cp", cp, "graft.net.ServeMain",
                                  str(PORT), os.path.join(REPO, "scripts", "parity_cfg.yaml")]
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 120
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read()
            sys.exit("server exited early rc=%s\n%s" % (proc.returncode, out[-4000:]))
        try:
            with socket.create_connection(("127.0.0.1", PORT), timeout=1):
                return proc
        except OSError:
            time.sleep(0.5)
    proc.kill()
    sys.exit("server did not open port %d within 120s" % PORT)


def check(label, cond, detail=""):
    if not cond:
        print("FAIL %s %s" % (label, detail))
        sys.exit(1)
    print("ok   %s" % label)


def main():
    proc = spawn_server()
    try:
        c = ClientSync("127.0.0.1", PORT)
        c.connect()

        # 1. insert through the unmodified reference encoder (tagged values)
        r = c.send_request(create_insert_request({"grade": 75, "name": "Bob"}, "grades"))
        rr = r["RequestResponse"]["response"]
        committed = rr["ManyResults"]["Ok"]
        # committed edits: grades source row + cascaded unionTest upsert
        check("insert grades commits cascade", len(committed) == 2, r)
        check("insert echoes tagged entry",
              any(e.get("grade") == {"Integer": 75} and e.get("name") == {"Str": "Bob"}
                  for e in committed), committed)

        r = c.send_request(create_insert_request({"age": 20, "name": "Bob"}, "users"))
        check("insert users commits cascade",
              len(r["RequestResponse"]["response"]["ManyResults"]["Ok"]) == 2, r)

        # 2. FindOne on the union table, key encoded by the reference client
        r = c.send_request(create_search_query("FindOne", "unionTest", "matchingKey", "Bob"))
        row = r["RequestResponse"]["response"]["OneResult"]["Ok"]
        check("union FindOne merges both sources",
              row.get("matchingKey") == {"Str": "Bob"}
              and row.get("age") == {"Integer": 20}
              and row.get("grade") == {"Integer": 75}, r)

        # 3. listen: a second reference client subscribes, the first inserts
        events = []
        got = threading.Event()

        def on_event(ev):
            events.append(ev)
            got.set()
            return True  # stop start_listen_blocking after the first event

        sub = ClientSync("127.0.0.1", PORT)
        sub.connect()
        t = threading.Thread(
            target=sub.start_listen_blocking, args=("grades", "Insert", on_event),
            daemon=True)
        t.start()
        time.sleep(2)  # let the StartListen frame register before inserting

        c.send_request(create_insert_request({"grade": 85, "name": "John"}, "grades"))
        check("listen event delivered", got.wait(timeout=60))
        ev = events[0]["Event"]
        check("event envelope matches reference shape",
              ev["table_name"] == "grades" and ev["event"] == "Insert", events[0])
        rows = ev["value"]["ManyResults"]["Ok"]
        check("event carries the inserted row",
              any(e.get("name") == {"Str": "John"} and e.get("grade") == {"Integer": 85}
                  for e in rows), rows)

        print("PASS: reference python client (sync) round-trips against GraftServer")

        # 4. the ASYNC client class: demuxed request/response + event queues
        #    (the examples/sample.py test_callback flow, bounded)
        import asyncio
        from reactive_db_client import ClientAsync

        async def async_flow():
            results = {}
            got_event = asyncio.Event()

            async def on_event(ev):
                results["event"] = ev
                got_event.set()
                return True

            async def callback(ac):
                await ac.start_listen_non_blocking("grades", "Insert", on_event)
                await asyncio.sleep(1)  # let StartListen register
                r = await ac.send_request(
                    create_search_query("FindOne", "unionTest", "matchingKey", "Bob"))
                results["findone"] = r
                await ac.send_request(
                    create_insert_request({"grade": 95, "name": "Async"}, "grades"))
                await asyncio.wait_for(got_event.wait(), timeout=60)

            client = ClientAsync("127.0.0.1", PORT)
            await asyncio.wait_for(client.connect(callback), timeout=120)
            return results

        results = asyncio.run(async_flow())
        row = results["findone"]["RequestResponse"]["response"]["OneResult"]["Ok"]
        check("async FindOne demuxes by request_id",
              row.get("matchingKey") == {"Str": "Bob"}, results["findone"])
        ev = results["event"]["Event"]
        check("async event queue receives the push",
              ev["table_name"] == "grades" and ev["event"] == "Insert"
              and any(e.get("name") == {"Str": "Async"}
                      for e in ev["value"]["ManyResults"]["Ok"]), results["event"])

        print("PASS: reference python client (async) round-trips against GraftServer")
    finally:
        proc.kill()


if __name__ == "__main__":
    main()
