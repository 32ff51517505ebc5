package graft.spec

/** Bundled draft meta-schemas — the reference validates schema documents
  * against these before use (`tests/test_validator.cpp:38-66` loads
  * `doc/schema/draft-07.json` and validates every fixture schema). The text
  * below is the public JSON Schema draft-07 meta-schema
  * (json-schema.org/draft-07/schema), reproduced from the published
  * standard. Validating against it exercises the deepest `$ref` machinery
  * in the engine: a root `$id`, `"$ref": "#"` self-recursion through every
  * value-descending keyword, boolean subschemas (`"default": true`),
  * `anyOf`-of-`$ref` dispatch, and unknown `format` values that must pass.
  */
object MetaSchemas {

  /** The public JSON Schema draft-03 meta-schema
    * (json-schema.org/draft-03/schema), reproduced from the published
    * standard. Exercises the draft-3-only surfaces: UNION TYPES mixing
    * names and embedded schemas (`"type": [{"$ref": "#"}, "boolean"]`),
    * string-form `dependencies`, `divisibleBy`, `disallow`, `extends`,
    * and the `"any"` type name. */
  val draft03: String =
    """{
      "$schema": "http://json-schema.org/draft-03/schema#",
      "id": "http://json-schema.org/draft-03/schema#",
      "type": "object",
      "properties": {
        "type": {
          "type": ["string", "array"],
          "items": { "type": ["string", { "$ref": "#" }] },
          "uniqueItems": true,
          "default": "any"
        },
        "properties": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "patternProperties": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "additionalProperties": {
          "type": [{ "$ref": "#" }, "boolean"],
          "default": {}
        },
        "items": {
          "type": [{ "$ref": "#" }, "array"],
          "items": { "$ref": "#" },
          "default": {}
        },
        "additionalItems": {
          "type": [{ "$ref": "#" }, "boolean"],
          "default": {}
        },
        "required": { "type": "boolean", "default": false },
        "dependencies": {
          "type": "object",
          "additionalProperties": {
            "type": ["string", "array", { "$ref": "#" }],
            "items": { "type": "string" }
          },
          "default": {}
        },
        "minimum": { "type": "number" },
        "maximum": { "type": "number" },
        "exclusiveMinimum": { "type": "boolean", "default": false },
        "exclusiveMaximum": { "type": "boolean", "default": false },
        "minItems": { "type": "integer", "minimum": 0, "default": 0 },
        "maxItems": { "type": "integer", "minimum": 0 },
        "uniqueItems": { "type": "boolean", "default": false },
        "pattern": { "type": "string", "format": "regex" },
        "minLength": { "type": "integer", "minimum": 0, "default": 0 },
        "maxLength": { "type": "integer" },
        "enum": { "type": "array", "minItems": 1, "uniqueItems": true },
        "default": { "type": "any" },
        "title": { "type": "string" },
        "description": { "type": "string" },
        "format": { "type": "string" },
        "divisibleBy": {
          "type": "number",
          "minimum": 0,
          "exclusiveMinimum": true,
          "default": 1
        },
        "disallow": {
          "type": ["string", "array"],
          "items": { "type": ["string", { "$ref": "#" }] },
          "uniqueItems": true
        },
        "extends": {
          "type": [{ "$ref": "#" }, "array"],
          "items": { "$ref": "#" },
          "default": {}
        },
        "id": { "type": "string", "format": "uri" },
        "$ref": { "type": "string", "format": "uri" },
        "$schema": { "type": "string", "format": "uri" }
      },
      "dependencies": {
        "exclusiveMinimum": "minimum",
        "exclusiveMaximum": "maximum"
      },
      "default": {}
    }"""

  /** The public JSON Schema draft-04 meta-schema
    * (json-schema.org/draft-04/schema), reproduced from the published
    * standard. Differs from draft-07 in ways that exercise distinct engine
    * paths: draft-4 `id` scoping, BOOLEAN `exclusiveMinimum`/`Maximum`
    * forms, top-level `dependencies` (exclusive bounds require their base
    * bound), `required` with `minItems: 1`, and NO boolean root schemas
    * (`"type": "object"`). All three drafts here are structurally
    * identical to the copies the reference bundles in `doc/schema/`. */
  val draft04: String =
    """{
      "id": "http://json-schema.org/draft-04/schema#",
      "$schema": "http://json-schema.org/draft-04/schema#",
      "description": "Core schema meta-schema",
      "definitions": {
        "schemaArray": {
          "type": "array",
          "minItems": 1,
          "items": { "$ref": "#" }
        },
        "positiveInteger": {
          "type": "integer",
          "minimum": 0
        },
        "positiveIntegerDefault0": {
          "allOf": [
            { "$ref": "#/definitions/positiveInteger" },
            { "default": 0 }
          ]
        },
        "simpleTypes": {
          "enum": ["array", "boolean", "integer", "null", "number", "object", "string"]
        },
        "stringArray": {
          "type": "array",
          "items": { "type": "string" },
          "minItems": 1,
          "uniqueItems": true
        }
      },
      "type": "object",
      "properties": {
        "id": { "type": "string", "format": "uri" },
        "$schema": { "type": "string", "format": "uri" },
        "title": { "type": "string" },
        "description": { "type": "string" },
        "default": {},
        "multipleOf": {
          "type": "number",
          "minimum": 0,
          "exclusiveMinimum": true
        },
        "maximum": { "type": "number" },
        "exclusiveMaximum": { "type": "boolean", "default": false },
        "minimum": { "type": "number" },
        "exclusiveMinimum": { "type": "boolean", "default": false },
        "maxLength": { "$ref": "#/definitions/positiveInteger" },
        "minLength": { "$ref": "#/definitions/positiveIntegerDefault0" },
        "pattern": { "type": "string", "format": "regex" },
        "additionalItems": {
          "anyOf": [
            { "type": "boolean" },
            { "$ref": "#" }
          ],
          "default": {}
        },
        "items": {
          "anyOf": [
            { "$ref": "#" },
            { "$ref": "#/definitions/schemaArray" }
          ],
          "default": {}
        },
        "maxItems": { "$ref": "#/definitions/positiveInteger" },
        "minItems": { "$ref": "#/definitions/positiveIntegerDefault0" },
        "uniqueItems": { "type": "boolean", "default": false },
        "maxProperties": { "$ref": "#/definitions/positiveInteger" },
        "minProperties": { "$ref": "#/definitions/positiveIntegerDefault0" },
        "required": { "$ref": "#/definitions/stringArray" },
        "additionalProperties": {
          "anyOf": [
            { "type": "boolean" },
            { "$ref": "#" }
          ],
          "default": {}
        },
        "definitions": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "properties": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "patternProperties": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "dependencies": {
          "type": "object",
          "additionalProperties": {
            "anyOf": [
              { "$ref": "#" },
              { "$ref": "#/definitions/stringArray" }
            ]
          }
        },
        "enum": {
          "type": "array",
          "minItems": 1,
          "uniqueItems": true
        },
        "type": {
          "anyOf": [
            { "$ref": "#/definitions/simpleTypes" },
            {
              "type": "array",
              "items": { "$ref": "#/definitions/simpleTypes" },
              "minItems": 1,
              "uniqueItems": true
            }
          ]
        },
        "allOf": { "$ref": "#/definitions/schemaArray" },
        "anyOf": { "$ref": "#/definitions/schemaArray" },
        "oneOf": { "$ref": "#/definitions/schemaArray" },
        "not": { "$ref": "#" }
      },
      "dependencies": {
        "exclusiveMaximum": ["maximum"],
        "exclusiveMinimum": ["minimum"]
      },
      "default": {}
    }"""

  val draft07: String =
    """{
      "$schema": "http://json-schema.org/draft-07/schema#",
      "$id": "http://json-schema.org/draft-07/schema#",
      "title": "Core schema meta-schema",
      "definitions": {
        "schemaArray": {
          "type": "array",
          "minItems": 1,
          "items": { "$ref": "#" }
        },
        "nonNegativeInteger": {
          "type": "integer",
          "minimum": 0
        },
        "nonNegativeIntegerDefault0": {
          "allOf": [
            { "$ref": "#/definitions/nonNegativeInteger" },
            { "default": 0 }
          ]
        },
        "simpleTypes": {
          "enum": ["array", "boolean", "integer", "null", "number", "object", "string"]
        },
        "stringArray": {
          "type": "array",
          "items": { "type": "string" },
          "uniqueItems": true,
          "default": []
        }
      },
      "type": ["object", "boolean"],
      "properties": {
        "$id": { "type": "string", "format": "uri-reference" },
        "$schema": { "type": "string", "format": "uri" },
        "$ref": { "type": "string", "format": "uri-reference" },
        "$comment": { "type": "string" },
        "title": { "type": "string" },
        "description": { "type": "string" },
        "default": true,
        "readOnly": { "type": "boolean", "default": false },
        "examples": { "type": "array", "items": true },
        "multipleOf": { "type": "number", "exclusiveMinimum": 0 },
        "maximum": { "type": "number" },
        "exclusiveMaximum": { "type": "number" },
        "minimum": { "type": "number" },
        "exclusiveMinimum": { "type": "number" },
        "maxLength": { "$ref": "#/definitions/nonNegativeInteger" },
        "minLength": { "$ref": "#/definitions/nonNegativeIntegerDefault0" },
        "pattern": { "type": "string", "format": "regex" },
        "additionalItems": { "$ref": "#" },
        "items": {
          "anyOf": [
            { "$ref": "#" },
            { "$ref": "#/definitions/schemaArray" }
          ],
          "default": true
        },
        "maxItems": { "$ref": "#/definitions/nonNegativeInteger" },
        "minItems": { "$ref": "#/definitions/nonNegativeIntegerDefault0" },
        "uniqueItems": { "type": "boolean", "default": false },
        "contains": { "$ref": "#" },
        "maxProperties": { "$ref": "#/definitions/nonNegativeInteger" },
        "minProperties": { "$ref": "#/definitions/nonNegativeIntegerDefault0" },
        "required": { "$ref": "#/definitions/stringArray" },
        "additionalProperties": { "$ref": "#" },
        "definitions": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "properties": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "default": {}
        },
        "patternProperties": {
          "type": "object",
          "additionalProperties": { "$ref": "#" },
          "propertyNames": { "format": "regex" },
          "default": {}
        },
        "dependencies": {
          "type": "object",
          "additionalProperties": {
            "anyOf": [
              { "$ref": "#" },
              { "$ref": "#/definitions/stringArray" }
            ]
          }
        },
        "propertyNames": { "$ref": "#" },
        "const": true,
        "enum": {
          "type": "array",
          "items": true,
          "minItems": 1,
          "uniqueItems": true
        },
        "type": {
          "anyOf": [
            { "$ref": "#/definitions/simpleTypes" },
            {
              "type": "array",
              "items": { "$ref": "#/definitions/simpleTypes" },
              "minItems": 1,
              "uniqueItems": true
            }
          ]
        },
        "format": { "type": "string" },
        "contentMediaType": { "type": "string" },
        "contentEncoding": { "type": "string" },
        "if": { "$ref": "#" },
        "then": { "$ref": "#" },
        "else": { "$ref": "#" },
        "allOf": { "$ref": "#/definitions/schemaArray" },
        "anyOf": { "$ref": "#/definitions/schemaArray" },
        "oneOf": { "$ref": "#/definitions/schemaArray" },
        "not": { "$ref": "#" }
      },
      "default": true
    }"""
}
