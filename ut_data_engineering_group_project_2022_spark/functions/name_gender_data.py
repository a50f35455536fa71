"""Vendored given-name -> gender lookup table (SURVEY F14 data path).

The reference infers author gender with the `gender_guesser` package
(ref dags/enrich.py:44-71), whose data derives from the public-domain
"nam_dict" given-name dictionary (Joerg Michael, published in c't
17/2007; the package itself is GPLv3 but the *associations* — which
names are male/female/ambiguous — are public knowledge). That package
is absent from this image, so this module vendors a curated
few-hundred-name subset of those public associations using the same
six-label vocabulary the package emits:

    male / female / mostly_male / mostly_female / andy (androgynous)

(anything absent -> "unknown"). This is a CURATED PUBLIC-KNOWLEDGE
subset, not a copy of the nam_dict file: labels follow widely known
usage (e.g. "andrea" is mostly_female — male in Italian; "kim" and
"robin" are ambiguous). Keys are lowercase.

Two consumers:
  * functions/gender.py — the pandas-UDF extension point's fallback
    lookup (fold-down to male/female/unknown happens there);
  * the broadcast-join path (gender_table_df) — the SCALE path: at
    100 TB a few-hundred-row broadcast join beats any Python UDF, and
    the same table keeps both paths bit-identical (test-pinned).
"""

from __future__ import annotations

_M = "male"
_F = "female"
_MM = "mostly_male"
_MF = "mostly_female"
_A = "andy"

#: lowercase given name -> gender_guesser-style label
NAME_GENDER: dict[str, str] = {
    # --- predominantly male ---
    **{
        n: _M
        for n in (
            "james john robert michael william david richard joseph "
            "thomas charles christopher daniel matthew anthony mark "
            "donald steven paul andrew joshua kenneth kevin brian "
            "george timothy ronald edward jason jeffrey ryan jacob "
            "gary nicholas eric jonathan stephen larry justin scott "
            "brandon benjamin samuel gregory frank alexander raymond "
            "patrick jack dennis jerry tyler aaron jose adam nathan "
            "henry douglas zachary peter kyle ethan walter noah "
            "jeremy christian keith roger gerald carl harold dylan "
            "arnold lawrence jesse bryan billy bruce gabriel joe "
            "logan alan juan albert willie elijah wayne randy mason "
            "vincent liam roy bobby caleb bradley russell lucas "
            "austin sean louis philip johnny ralph eugene howard "
            "martin craig todd earl "
            # common European / Latin / Slavic male names
            "hans pierre jacques michel claude luigi giovanni marco "
            "paolo giuseppe andreas stefan klaus wolfgang werner "
            "helmut dieter ivan sergei dmitri boris vladimir mikhail "
            "nikolai carlos miguel pedro antonio francisco javier "
            "rafael diego fernando pablo alejandro manuel jorge "
            "erik lars sven nils olaf gustav henrik magnus anders "
            "per ole bjorn mohammed ahmed ali omar hassan ibrahim "
            "wei ming hiroshi takeshi kenji raj sanjay vijay amit "
            "rahul arjun"
        ).split()
    },
    # --- predominantly female ---
    **{
        n: _F
        for n in (
            "mary patricia jennifer linda elizabeth barbara susan "
            "jessica sarah karen lisa nancy betty margaret sandra "
            "ashley kimberly emily donna michelle carol amanda "
            "dorothy melissa deborah stephanie rebecca sharon laura "
            "cynthia kathleen amy angela shirley anna brenda pamela "
            "emma nicole helen samantha katherine christine debra "
            "rachel carolyn janet catherine maria heather diane ruth "
            "julie olivia joyce virginia victoria kelly lauren "
            "christina joan evelyn judith megan cheryl hannah "
            "jacqueline martha gloria teresa sara madison kathryn "
            "janice abigail alice julia judy sophia grace denise "
            "amber doris marilyn danielle beverly isabella theresa "
            "diana natalie brittany charlotte marie kayla alexis "
            "lori ann "
            # common European / Latin / Slavic female names
            "elena sofia ingrid astrid birgit heidi monica chiara "
            "giulia francesca alessandra valentina paola svetlana "
            "natasha olga irina tatiana ludmila katarina eva "
            "isabel carmen lucia pilar dolores josefa rosa "
            "fatima aisha leila yasmin mei li priya anjali deepa "
            "sunita lakshmi"
        ).split()
    },
    # --- mostly male (ambiguous, male-leaning) ---
    **{
        n: _MM
        for n in (
            "chris sam alex charlie francis lee angel jan jordan "
            "terry jody nikita loren noel"
        ).split()
    },
    # --- mostly female (ambiguous, female-leaning) ---
    **{
        n: _MF
        for n in (
            "andrea jamie leslie robin dana ariel sasha courtney "
            "shannon kelsey lindsay carol-ann riley vivian"
        ).split()
    },
    # --- androgynous ---
    **{
        n: _A
        for n in (
            "kim morgan taylor casey avery quinn skyler kerry pat "
            "jean chi yuki ming-yu"
        ).split()
    },
}
