"""Serializer unit tests, mirroring /root/reference/handler_test.go:7-512."""

from access_log_parser_spark.handlers import (
    apply_prefix,
    escape_string,
    json_line_handler,
    kv_pair_line_handler,
    ltsv_line_handler,
    pretty_json_line_handler,
    tsv_line_handler,
)

LS = ["label1", "label2", "label3"]
VS = ["value1", "value2", "value3"]


def test_json_basic():
    assert (
        json_line_handler(LS, VS)
        == '{"label1":"value1","label2":"value2","label3":"value3"}'
    )


def test_json_values_longer_than_labels_truncated():
    # handler.go guards i < len(labels): extra values dropped
    assert (
        json_line_handler(LS, [*VS, "value4"])
        == '{"label1":"value1","label2":"value2","label3":"value3"}'
    )


def test_json_values_shorter_than_labels_truncates_output():
    assert (
        json_line_handler(LS, VS[:2]) == '{"label1":"value1","label2":"value2"}'
    )


def test_json_escaping_only_five_chars():
    # writeEscapedString escapes \ " \n \r \t only; unicode/control raw
    assert escape_string('a\\b"c\nd\re\tf') == 'a\\\\b\\"c\\nd\\re\\tf'
    assert escape_string("héllo\x01<>&") == "héllo\x01<>&"
    assert (
        json_line_handler(["k"], ['va"l\\ue'])
        == '{"k":"va\\"l\\\\ue"}'
    )


def test_pretty_json():
    assert (
        pretty_json_line_handler(LS[:2], VS[:2])
        == '{\n  "label1": "value1",\n  "label2": "value2"\n}'
    )


def test_kv():
    assert (
        kv_pair_line_handler(LS, VS)
        == 'label1="value1" label2="value2" label3="value3"'
    )


def test_ltsv_empty_becomes_dash():
    assert (
        ltsv_line_handler(LS, ["value1", "", "value3"])
        == "label1:value1\tlabel2:-\tlabel3:value3"
    )


def test_tsv_header_on_first():
    assert tsv_line_handler(LS, VS, True) == "label1\tlabel2\tlabel3\nvalue1\tvalue2\tvalue3"
    assert tsv_line_handler(LS, VS, False) == "value1\tvalue2\tvalue3"
    assert tsv_line_handler(LS, ["v", "", "w"], False) == "v\t-\tw"


def test_apply_prefix_multiline():
    assert apply_prefix("a\nb", "[ P ] ") == "[ P ] a\n[ P ] b"
