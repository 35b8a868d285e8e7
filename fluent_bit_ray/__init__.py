"""fluent_bit_ray — a Ray-Data-native log/transcript processing engine.

A from-scratch reimplementation of the *semantics* of Fluent Bit
(reference: CircleCI-TestMaplelabs/fluent-bit, studied read-only at
/root/reference) on top of ``ray.data.Dataset``:

- records are Arrow rows (fixed transcript columns + a JSON ``fields``
  column for parsed/dynamic keys), not msgpack ``[ts, map]`` pairs;
- the filter chain is an ordered list of vectorized ``map_batches``
  stages;
- tag/match routing computes a per-row routes bitmask and fans out to
  per-sink filtered views;
- stateful enrichment (kubernetes/geoip/ldap/uaparser-style lookups)
  runs in actor pools with the dimension table held per-actor;
- the stream-processor subset (SELECT/WHERE/GROUP BY + tumbling/hopping
  windows) maps to event-time bucketing + ``groupby().aggregate``.

Nothing here calls ``ray.init``; callers (bench.py, tests, the driver)
own the Ray session.
"""

__version__ = "0.1.0"
