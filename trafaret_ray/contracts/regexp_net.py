"""String-format and internet validators (reference trafaret/regexp.py,
trafaret/internet.py).

Vectorized via ``pc.match_substring_regex`` / ``pc.extract_regex``; the
idna-encoding retry branch of Email/URL runs python-side on the failed mask
only, mirroring the reference's composition pattern (internet.py:15-49:
complex validators are built *from other trafarets* with And/Or/OnError).

The regex patterns below are written fresh against the documented semantics
(reference tests/test_internet.py); they are not copies.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import codes
from .base import Contract, And, OnError, Or, WithRepr
from .result import CheckResult, DataError, null_out
from .scalars import Call, String, valid_mask, _np_mask, _is_string_type


class RegexpRaw(Contract):
    """``re.match``; scalar path returns the match OBJECT
    (reference regexp.py:7-26). Batch path emits the matched prefix."""

    MSG = 'does not match pattern %s'
    _return_match_object = True

    def __init__(self, regexp, re_flags=0):
        self.regexp = re.compile(regexp, re_flags)
        self.raw_pattern = regexp

    def _anchored(self):
        # re.match anchors at the start only
        return '^(?:%s)' % self.raw_pattern

    def apply(self, arr):
        if not _is_string_type(arr.type):
            return CheckResult.fail_all(
                arr, codes.IS_NOT_A_STRING, 'value is not a string')
        ok = valid_mask(arr)
        flags_ok = (self.regexp.flags & ~re.UNICODE) == 0
        try:
            if not flags_ok:
                raise pa.ArrowInvalid('py-only flags')
            m = _np_mask(pc.match_substring_regex(arr, self._anchored()))
            res = CheckResult.from_mask(arr, ok, codes.IS_NOT_A_STRING,
                                        'value is not a string')
            res = res.merge_fail(m | ~ok, codes.DOES_NOT_MATCH_RE,
                                 self.MSG % self.raw_pattern)
            # emit matched prefix: python extraction only on surviving rows
            vals = arr.to_pylist()
            out = [None] * len(vals)
            for i in np.nonzero(res.ok)[0]:
                mo = self.regexp.match(vals[i])
                out[i] = mo.group() if mo else None
            return CheckResult(pa.array(out, type=pa.string()), res.ok,
                               res.codes, res.msgs)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # python fallback (RE2-incompatible patterns e.g. backrefs)
            vals = arr.to_pylist()
            n = len(vals)
            out = [None] * n
            m = np.zeros(n, dtype=bool)
            for i, v in enumerate(vals):
                if v is None:
                    continue
                mo = self.regexp.match(v)
                if mo:
                    m[i] = True
                    out[i] = mo.group()
            res = CheckResult.from_mask(pa.array(out, type=pa.string()),
                                        ok, codes.IS_NOT_A_STRING,
                                        'value is not a string')
            return res.merge_fail(m | ~ok, codes.DOES_NOT_MATCH_RE,
                                  self.MSG % self.raw_pattern)

    def _scalar_check(self, value, context=None):
        if not isinstance(value, str):
            raise DataError('value is not a string', value=value,
                            code=codes.IS_NOT_A_STRING)
        mo = self.regexp.match(value)
        if not mo:
            raise DataError(self.MSG % self.raw_pattern, value=value,
                            code=codes.DOES_NOT_MATCH_RE)
        return mo if self._return_match_object else mo.group()

    def __repr__(self):
        return '<Regexp "%s">' % self.raw_pattern


class Regexp(RegexpRaw):
    """RegexpRaw returning ``match.group()`` (reference regexp.py:29-31)."""
    _return_match_object = False


class RegexpString(String):
    """String constraints + optional str_method + regex
    (reference regexp.py:34-50)."""

    regex = ''
    str_method = None  # e.g. 'lower'

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._compiled = re.compile(self.regex)

    def apply(self, arr):
        res = super().apply(arr)
        if not _is_string_type(arr.type):
            return res
        s = arr
        if self.str_method == 'lower':
            s = pc.utf8_lower(s)
        elif self.str_method == 'upper':
            s = pc.utf8_upper(s)
        # reference semantics: re.match = anchored at the START only
        # (the class regex carries its own $ when it wants a full match)
        m = _np_mask(pc.match_substring_regex(
            s.fill_null(''), '^(?:%s)' % self.regex))
        out = s if self.str_method else res.values
        res2 = res.merge_fail(m | ~res.ok, codes.DOES_NOT_MATCH_RE,
                              'does not match pattern %s' % self.regex)
        return CheckResult(null_out(out, res2.ok), res2.ok,
                           res2.codes, res2.msgs)

    def _scalar_check(self, value, context=None):
        arr = pa.array([value]) if isinstance(value, str) else None
        if arr is None:
            raise DataError('value is not a string', value=value,
                            code=codes.IS_NOT_A_STRING)
        res = self.apply(arr)
        res.scalar_raise()
        return res.values[0].as_py()

    def __repr__(self):
        return '<RegexpString "%s">' % self.regex


class Hex(RegexpString):
    """``^[0-9a-f]*$`` after lower() (reference internet.py:52-57)."""
    regex = r'^[0-9a-f]*$'
    str_method = 'lower'

    def __repr__(self):
        return '<Hex>'


class URLSafe(RegexpString):
    """``^[0-9A-Za-z_-]*$`` (reference internet.py:60-64)."""
    regex = r'^[0-9A-Za-z-_]*$'

    def __repr__(self):
        return '<URLSafe>'


# -- Email / URL: composed from primitives, mirroring the reference's
#    user-extension pattern (internet.py:15-49, 67-91) -----------------------

_TLD_RE = r"(?:[A-Z]{2,63}|XN--[A-Z0-9-]{1,59})"

_EMAIL_RE = (
    r"[A-Z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[A-Z0-9!#$%&'*+/=?^_`{|}~-]+)*"
    r"@(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+"
    + _TLD_RE
)

# URL host labels allow underscores and a bare alnum TLD form, matching
# the reference URL_REGEXP's acceptance (internet.py:67-77,
# tests/test_internet.py:62-63: example_underscore.net is valid)
_URL_RE = (
    r"(?:https?|ftp)://"
    r"(?:[^\s:@/]+(?::[^\s:@/]*)?@)?"
    r"(?:(?:[A-Z0-9](?:[A-Z0-9-_]{0,61}[A-Z0-9])?\.)+"
    r"(?:[A-Z]{2,63}\.?|[A-Z0-9-]{2,}\.?)"
    r"|localhost"
    r"|\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::\d+)?"
    r"(?:/\S*)?"
)


def _email_idna_encode(value):
    """idna-normalize the domain part then revalidate
    (reference internet.py:31-36)."""
    try:
        local, _, domain = value.rpartition('@')
        if not local:
            raise DataError('is not a valid email address', value=value)
        domain = domain.encode('idna').decode('ascii')
        return '%s@%s' % (local, domain)
    except (UnicodeError, IndexError):
        raise DataError('is not a valid email address', value=value)


def _url_idna_encode(value):
    """idna-normalize the netloc then revalidate (reference internet.py:80-83)."""
    try:
        from urllib.parse import urlsplit, urlunsplit
        scheme, netloc, path, query, fragment = urlsplit(value)
        if '@' in netloc:
            userinfo, _, host = netloc.rpartition('@')
            userinfo += '@'
        else:
            userinfo, host = '', netloc
        if ':' in host:
            host, _, port = host.partition(':')
            port = ':' + port
        else:
            port = ''
        host = host.encode('idna').decode('ascii')
        return urlunsplit((scheme, userinfo + host + port, path, query,
                           fragment))
    except (UnicodeError, ValueError):
        raise DataError('value is not URL', value=value)


def _to_str():
    """bytes/str -> str gate (reference internet.py:39: to_str sits
    OUTSIDE the email OnError, so non-strings report
    'value is not a string')."""
    from .scalars import FromBytes
    return OnError(FromBytes('utf-8') | String(),
                   'value is not a string', code=codes.IS_NOT_A_STRING)


def _email():
    """str -> normalized email (reference internet.py:15-49): length-capped
    String, regex pass, idna-encoded retry for unicode domains."""
    rx = Regexp('(?i)^%s$' % _EMAIL_RE)
    return WithRepr(
        _to_str() & OnError(
            String(max_length=254)
            & (rx | (Call(_email_idna_encode) & rx)),
            'value is not a valid email address',
            code=codes.IS_NOT_VALID_EMAIL,
        ),
        '<Email>',
    )


def _url():
    """str -> normalized URL (reference internet.py:67-91)."""
    rx = Regexp('(?i)^%s$' % _URL_RE)
    return WithRepr(
        OnError(
            String() & (rx | (Call(_url_idna_encode) & rx)),
            'value is not URL',
            code=codes.IS_NOT_VALID_URL,
        ),
        '<URL>',
    )


_IPV4_RE = (
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
)

# Full RFC-4291 forms incl. '::' elision and embedded IPv4
# (reference internet.py:94-131 uses a pure regex as well).
_H = r"[0-9A-Fa-f]{1,4}"
_IPV6_RE = (
    r"(?:"
    rf"(?:{_H}:){{7}}{_H}"
    rf"|(?:{_H}:){{1,7}}:"
    rf"|(?:{_H}:){{1,6}}:{_H}"
    rf"|(?:{_H}:){{1,5}}(?::{_H}){{1,2}}"
    rf"|(?:{_H}:){{1,4}}(?::{_H}){{1,3}}"
    rf"|(?:{_H}:){{1,3}}(?::{_H}){{1,4}}"
    rf"|(?:{_H}:){{1,2}}(?::{_H}){{1,5}}"
    rf"|{_H}:(?::{_H}){{1,6}}"
    rf"|:(?:(?::{_H}){{1,7}}|:)"
    rf"|(?:{_H}:){{6}}{_IPV4_RE}"
    rf"|(?:{_H}:){{1,5}}:{_IPV4_RE}"
    rf"|::(?:{_H}:){{0,5}}{_IPV4_RE}"
    r")"
    r"(?:%[0-9A-Za-z]+)?"  # optional zone index (fe80::1%en0)
)


def _ipv4():
    return WithRepr(
        OnError(Regexp('^%s$' % _IPV4_RE), 'value is not IPv4 address',
                code=codes.IS_NOT_IPv4),
        '<IPv4>')


def _ipv6():
    return WithRepr(
        OnError(Regexp('^%s$' % _IPV6_RE), 'value is not IPv6 address',
                code=codes.IS_NOT_IPv6),
        '<IPv6>')


def _ip():
    """IPv4 | IPv6 (reference internet.py:128-131)."""
    return WithRepr(
        OnError(Or(_ipv4(), _ipv6()), 'value is not IP address',
                code=codes.IS_NOT_IP),
        '<IP>')


# module-level instances, matching the reference's API shape
# (reference internet.py:44-131 exports composed INSTANCES, not classes)
Email = _email()
URL = _url()
IPv4 = _ipv4()
IPv6 = _ipv6()
IP = _ip()
