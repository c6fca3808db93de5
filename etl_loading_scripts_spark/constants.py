"""Sentinel-key conventions of the reference workload (SURVEY §7.4 R3).

The reference marks "not yet mapped" fact rows with placeholder FK values and
every incremental update guards on them (e.g. ``UpdMapDimRest.sql:473``
``RestaurantKey = 0``, ``script.sql(S3):64`` ``SFRestaurantKey = 1``,
``UpdtMapDimPatron.sql:129`` ``patron_id = 1``). Encoded once here: a wrong
guard silently remaps history.
"""

from __future__ import annotations

# Placeholder FK value per fact column meaning "unmapped; eligible for the
# next mapping wave". NULL is additionally treated as unmapped everywhere.
UNMAPPED_PATRON_ID = 1
UNMAPPED_UNIQUE_PATRON_ID = 0
UNMAPPED_RESTAURANT_KEY = 0
UNMAPPED_SF_RESTAURANT_KEY = 1
UNMAPPED_BILLING_GROUP_KEY = 0
UNMAPPED_FINGERPRINT_ID = 0

# Protected rows that MERGE by-source deletes must never remove
# (spScript.sql(P-SF):201-202, 302-303).
PROTECTED_SF_KEY = "XXXXXXXXXXXXXXX"
PROTECTED_FINGERPRINT_ID = 0

# Far-future "still valid" date sentinel (BillingGroup_script.sql(S4):22).
VALID_TO_SENTINEL = "9999-12-31"

# Default "unknown" restaurant-group key (UpdMapDimRest.sql:267,452).
UNKNOWN_RESTAURANT_GROUP_KEY = 606
